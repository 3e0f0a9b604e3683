from .frame import FrameResult, make_frame_processor

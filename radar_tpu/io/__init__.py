from .binio import (BinFrameMeta, probe_bin, read_bin, read_bin_frames,
                    write_bin)
from .checkpoint import (CheckpointStore, SaveOptions, load_sim_frame,
                         save_detection_log_json, save_sim_frame)

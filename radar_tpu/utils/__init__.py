from .profiling import FrameMetrics, MetricsLog, StageTimer, trace
from .signal import (fir_group_delay_mean, kaiser_window, next_pow2,
                     spline_upsample_matrix)

from .collectives import (covariance_snapshot_sharded, dbf_channel_sharded,
                          mtd_cpi_sharded, pulse_compress_range_sharded)
from .mesh import AXIS_CH, AXIS_CPI, AXIS_DP, make_mesh
from .multihost import initialize, local_batch_slice, make_multihost_mesh
from .sharded import make_sharded_frame_processor

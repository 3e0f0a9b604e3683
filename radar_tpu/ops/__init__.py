from .cfar import Detections, extract_detections, goca_cfar_2d, pair_sum_maps
from .dbf import dbf
from .mtd import mtd, zero_velocity_suppress
from .pulse_compression import make_plan, pulse_compress

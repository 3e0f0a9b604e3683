from .calibrate import beam_patterns, calibrate_k_slopes
from .steering import steering_vector, synthesize_dbf_bank

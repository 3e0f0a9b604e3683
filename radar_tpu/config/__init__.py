from . import assets
from .params import RadarConfig, full_config, scaled_config, small_test_config

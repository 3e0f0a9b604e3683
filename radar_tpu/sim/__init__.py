from .echo import (add_noise, add_noise_beamspace, beam_noise_factor,
                   synthesize_echo_beams, synthesize_echoes)
from .scenario import Scenario, TargetBatch, default_two_target_scene, five_target_scene

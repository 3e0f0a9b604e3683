from .echo import add_noise, synthesize_echoes
from .scenario import Scenario, TargetBatch, default_two_target_scene, five_target_scene

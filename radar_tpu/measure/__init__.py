from .estimate import ParamDetections, estimate_parameters

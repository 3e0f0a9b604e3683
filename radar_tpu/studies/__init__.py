"""Measured-negative study kernels: tested implementations that LOST their
integrated A/B on hardware and are kept as recorded evidence (ROADMAP.md),
deliberately outside the production ops/ namespace so shipped code has no
unwired production-lookalike paths."""

from .precompute import Precomputed, build_tx_pulse, precompute

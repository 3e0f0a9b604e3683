"""Small statistical helpers shared by the measurement scripts."""

from __future__ import annotations

import math


def wilson_ci(k: int, n: int, z: float = 1.96) -> tuple[float, float]:
    """95% Wilson score interval for a binomial proportion — honest
    uncertainty beside a quoted Pd (the round-4 verdict flagged a
    two-digit headline resting on 200 trials). Shared by
    scripts/run_roc_full.py and scripts/run_roc_realdata.py so the two
    headline CI conventions cannot diverge."""
    p = k / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return float(center - half), float(center + half)

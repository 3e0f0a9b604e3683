"""Device-mesh construction for the distributed radar pipeline (SURVEY.md
section 2.3 — no reference counterpart: the reference is single-process
MATLAB with one ``parfor``).

Mesh axes and their radar meaning:

  - ``dp``:  data parallel — Monte-Carlo trials / frame batches
  - ``ch``:  channel parallel — array elements sharded across devices; the
             DBF channel-combine and MUSIC covariance become psum reductions
             (TP analog)
  - ``cpi``: slow-time parallel — pulse blocks of a CPI sharded; MTD needs a
             resharding transpose (sequence-parallel analog)

Collectives ride ICI within a slice when the mesh is built over the default
device order; DCN axes go first for multi-slice runs (jax.distributed).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


AXIS_DP = "dp"
AXIS_CH = "ch"
AXIS_CPI = "cpi"


def make_mesh(dp: int = 1, ch: int = 1, cpi: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, ch, cpi) mesh over the first dp*ch*cpi devices."""
    n = dp * ch * cpi
    if devices is None:
        devices = jax.devices()
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, ch, cpi)
    return Mesh(arr, (AXIS_DP, AXIS_CH, AXIS_CPI))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spec(mesh: Mesh, *axes) -> NamedSharding:
    """NamedSharding with one entry per array dim; None = replicated dim."""
    return NamedSharding(mesh, P(*axes))

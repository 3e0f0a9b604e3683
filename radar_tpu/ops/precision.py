"""Mixed-precision complex contraction for the MXU.

TPU MXUs run bfloat16 multiplies at ~2x the float32 rate with float32
accumulation. A complex64 einsum is four real einsums; casting the real and
imaginary PLANES to bf16 (complex64 is stored planar on TPU, so the splits
are free — verify skill) and accumulating in f32 halves the matmul time at
the cost of input quantization only (~2^-9 relative). Used by the MTD DFT
matmul and the banded-Toeplitz pulse-compression matmul when
``cfg.matmul_precision == "bf16"`` — detection statistics validated in
results/bf16_matmul.json (detections are threshold crossings with factor 8;
a 0.2% RDM perturbation is statistically invisible).

No reference counterpart (the reference is float64 MATLAB end to end); this
is a TPU-native accuracy/throughput tradeoff exposed as an explicit config
variant.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def einsum_complex_bf16(subscripts: str, a: jnp.ndarray, b: jnp.ndarray,
                        out_dtype=jnp.complex64) -> jnp.ndarray:
    """``einsum(subscripts, a, b)`` for complex operands with bf16 multiply
    planes and f32 accumulation. Real operands are promoted with a zero
    imaginary plane skipped (two matmuls instead of four)."""
    f32 = jnp.float32
    a_c = jnp.iscomplexobj(a)
    b_c = jnp.iscomplexobj(b)
    ar = jnp.real(a).astype(jnp.bfloat16)
    br = jnp.real(b).astype(jnp.bfloat16)
    ee = lambda x, y: jnp.einsum(subscripts, x, y,
                                 preferred_element_type=f32)
    if a_c and b_c:
        ai = jnp.imag(a).astype(jnp.bfloat16)
        bi = jnp.imag(b).astype(jnp.bfloat16)
        rr = ee(ar, br) - ee(ai, bi)
        ri = ee(ar, bi) + ee(ai, br)
    elif a_c:
        ai = jnp.imag(a).astype(jnp.bfloat16)
        rr, ri = ee(ar, br), ee(ai, br)
    elif b_c:
        bi = jnp.imag(b).astype(jnp.bfloat16)
        rr, ri = ee(ar, br), ee(ar, bi)
    else:
        return ee(ar, br).astype(out_dtype)
    return lax.complex(rr, ri).astype(out_dtype)

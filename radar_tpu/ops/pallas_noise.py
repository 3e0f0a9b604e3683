"""Fused AWGN Pallas kernel — on-core hardware PRNG + Box-Muller + add.

The reference draws per-channel independent complex Gaussian noise with
MATLAB ``randn`` every frame (fun_process_single_frame.m:81-88). The
framework's default is counter-based ``jax.random.normal`` (threefry),
which costs ~2.3 ms of the ~9 ms frame on a v5e chip — the PRNG math is
ALU-bound and the noise cube round-trips through HBM before a separate add.

This kernel offers a fused alternative: each grid block seeds the core's
hardware PRNG (``pltpu.prng_seed``) with a per-(key, block) stream id,
draws two uint32 words per complex sample (``pltpu.prng_random_bits``),
converts them into a full Box-Muller pair (r*cos -> I rail, r*sin -> Q
rail), scales by sqrt(p_noise/2), and adds onto the signal in one VMEM
pass — the noise never touches HBM.

Layout note (measured on v5e): complex64 is stored planar on TPU, so
``jnp.real``/``jnp.imag``/``lax.complex`` are free while a
``.view(float32)`` interleave costs ~2.4 ms per direction at frame size —
hence the kernel's interface is a (real, imag) plane pair, not a rail
view.

Statistical contract (tested on hardware, not bit-parity): rails are
i.i.d. N(0, p_noise/2), independent across pulses/samples/channels — the
same contract the reference's per-channel ``randn`` loop establishes
(SURVEY.md section 5.2); measured on v5e: mean/var/kurtosis/lag-1 all
match N(0, 0.5) to 4 decimals (results/pallas_noise.json).

Measured verdict (v5e, [332, 5819, 16] frame, on-device fori_loop): this
kernel runs ~3.6 ms vs threefry's ~2.4 ms — Mosaic's log/cos/sin
throughput loses to XLA's fused erfinv path, and sqrt-sign tricks did not
close the gap. The threefry path therefore REMAINS THE DEFAULT everywhere;
this kernel ships as the ``noise_impl="pallas"`` variant: the pattern for
on-core PRNG fusion, and a net win on backends where transcendental
throughput beats the threefry integer path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _awgn_kernel(seed_ref, re_ref, im_ref, ore_ref, oim_ref, *,
                 sigma: float):
    # distinct PRNG stream per block: Knuth multiplicative hash of the
    # block index mixed into the frame seed
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * np.int32(-1640531527))
    shape = re_ref.shape
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # Mosaic has no uint32->f32 cast; >>8 fits in int32, bitcast first.
    # 24-bit uniforms in (0, 1): (k + 0.5) * 2^-24 never hits 0, so
    # log(u1) stays finite.
    k1 = pltpu.bitcast(b1 >> 8, jnp.int32).astype(jnp.float32)
    k2 = pltpu.bitcast(b2 >> 8, jnp.int32).astype(jnp.float32)
    u1 = (k1 + 0.5) * np.float32(2.0 ** -24)
    theta = np.float32(2.0 * np.pi * 2.0 ** -24) * k2
    r = jnp.sqrt(np.float32(-2.0) * jnp.log(u1)) * np.float32(sigma)
    ore_ref[:] = re_ref[:] + r * jnp.cos(theta)
    oim_ref[:] = im_ref[:] + r * jnp.sin(theta)


def _lane_block(w: int, p: int) -> int:
    """Lane-axis block: multiple of 128, sized so the ~13 block-shaped
    VMEM buffers (4 double-buffered ios + elementwise temps) stay under
    the 16 MB scoped limit."""
    budget_elems = (10 << 20) // (13 * 4)
    bw = max(budget_elems // max(p, 1) // 128 * 128, 128)
    return min(-(-w // 128) * 128, bw)


@functools.partial(jax.jit, static_argnames=("p_noise", "interpret"))
def add_noise_pallas(key: jax.Array, raw_iq: jax.Array,
                     p_noise: float = 1.0,
                     interpret: bool = False) -> jax.Array:
    """``raw_iq + complex AWGN`` with per-rail std sqrt(p_noise/2).

    ``raw_iq`` is complex64, any rank >= 1; the kernel grids over the
    leading axis. The key seeds the hardware PRNG — same key, same noise
    (on the same backend; the stream differs from the threefry path's).
    """
    if raw_iq.dtype != jnp.complex64:
        raise ValueError(f"pallas AWGN is complex64-only, got "
                         f"{raw_iq.dtype}")
    shape = raw_iq.shape
    p = shape[0]
    w = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
    # real/imag are free on TPU (planar complex storage); a rail .view
    # would relayout
    re = jnp.real(raw_iq).reshape(p, w)
    im = jnp.imag(raw_iq).reshape(p, w)
    bw = _lane_block(w, p)
    kd = jax.random.key_data(key).astype(jnp.uint32)
    seed = (kd[..., 0] ^ (kd[..., 1] * jnp.uint32(2654435761))).astype(
        jnp.int32).reshape((1,))
    sigma = float(np.sqrt(p_noise / 2.0))
    # TPU block rule: last dim multiple of 128 (ragged tail masked),
    # second-to-last equal to the full axis; grid over the lane axis
    spec = pl.BlockSpec((p, bw), lambda i, s: (0, i),
                        memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        functools.partial(_awgn_kernel, sigma=sigma),
        out_shape=(jax.ShapeDtypeStruct((p, w), jnp.float32),
                   jax.ShapeDtypeStruct((p, w), jnp.float32)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(-(-w // bw),),
            in_specs=[spec, spec],
            out_specs=(spec, spec),
        ),
        # CPU tests: TPU-semantics interpreter (the plain interpreter has
        # no lowering for prng_seed); its PRNG is NOT statistically
        # meaningful — functional checks only
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, re, im)
    return jax.lax.complex(out_re, out_im).reshape(shape)

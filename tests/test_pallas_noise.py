"""Fused Pallas AWGN kernel (ops/pallas_noise.py).

On CPU the kernel runs under the TPU-semantics interpreter whose PRNG is
NOT statistically meaningful, so these are functional checks (shape,
dtype, signal pass-through, validation); the statistical contract
(N(0, p_noise/2) moments, independence, determinism) was validated on a
real v5e chip — measured numbers in results/pallas_noise.json.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_tpu.ops.pallas_noise import add_noise_pallas


def test_shape_dtype_and_signal_passthrough():
    x = jax.lax.complex(jnp.full((16, 64, 4), 3.0, jnp.float32),
                        jnp.full((16, 64, 4), -2.0, jnp.float32))
    y = add_noise_pallas(jax.random.PRNGKey(0), x, p_noise=1.0,
                         interpret=True)
    assert y.shape == x.shape and y.dtype == jnp.complex64
    # noise is additive around the signal: mean offset is the signal
    # (interpreter PRNG is degenerate but still zero-mean-ish per rail is
    # NOT guaranteed; only check finiteness and that y != x somewhere)
    y = np.asarray(y)
    assert np.isfinite(y.real).all() and np.isfinite(y.imag).all()
    assert not np.array_equal(y, np.asarray(x))


def test_rejects_wrong_dtype():
    x = jnp.zeros((8, 128), jnp.float32)
    with pytest.raises(ValueError):
        add_noise_pallas(jax.random.PRNGKey(0), x, interpret=True)


def test_pipeline_variant_runs():
    """noise_impl='pallas' wires through the frame processor (interpret
    mode on CPU)."""
    from radar_tpu.config.params import small_test_config
    from radar_tpu.pipeline.frame import make_frame_processor
    from radar_tpu.sim.scenario import TargetBatch

    cfg = small_test_config(channels=8, pulses=32).replace(
        noise_impl="pallas")
    process = make_frame_processor(cfg, dtype=jnp.complex64)
    tb = TargetBatch.make([3000.0], [10.0], [10.0], [20.0])
    result = jax.block_until_ready(process(jax.random.PRNGKey(0), tb))
    assert result.targets.range_m.shape[0] > 0


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG statistics need a real TPU")
def test_noise_statistics_on_tpu():
    p, s, c = 332, 5819, 16

    @jax.jit
    def moments(k):
        x = jax.lax.complex(jnp.zeros((p, s, c), jnp.float32),
                            jnp.zeros((p, s, c), jnp.float32))
        y = add_noise_pallas(k, x, p_noise=1.0)
        re, im = jnp.real(y), jnp.imag(y)
        return jnp.stack([jnp.mean(re), jnp.var(re), jnp.var(im),
                          jnp.mean((re - jnp.mean(re))**4)
                          / jnp.var(re)**2, jnp.mean(re * im)])

    m = np.asarray(moments(jax.random.PRNGKey(0)))
    assert abs(m[0]) < 5e-3
    assert abs(m[1] - 0.5) < 5e-3 and abs(m[2] - 0.5) < 5e-3
    assert abs(m[3] - 3.0) < 5e-2
    assert abs(m[4]) < 5e-3

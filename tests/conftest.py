"""Test configuration: force the CPU backend with 8 virtual devices
(multi-host sharding is tested on a CPU mesh per SURVEY.md section 4
"Multi-node without a cluster") and enable x64 so parity tests can run in
float64/complex128 against the numpy oracle.

NB: the ambient environment may pin JAX to a TPU tunnel backend (e.g.
``JAX_PLATFORMS=axon``) that ignores an env-var override and has no
complex128 support — ``jax.config.update("jax_platforms", ...)`` is the
override that actually sticks.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

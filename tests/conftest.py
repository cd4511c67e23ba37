"""Test configuration: force a virtual 8-device CPU mesh.

IMPORTANT: the axon TPU environment pre-imports jax at interpreter start
(sitecustomize) with jax_platforms="axon,cpu", so setting JAX_PLATFORMS in
os.environ is too late.  Backends initialize lazily, so overriding the jax
config here (before any jax operation runs) still works.  Tests must never
run over the tunneled TPU — it is a single-client resource and concurrent
test processes deadlock on it.  Multi-chip sharding is validated on the
virtual 8-device CPU mesh; bench.py uses the real TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", (
    "tests must run on CPU, got " + jax.default_backend()
)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

"""Test configuration: run on the CPU backend with 8 virtual devices.

Env vars must be set in os.environ BEFORE jax is first imported: the
container's sitecustomize registers the axon TPU plugin at jax import time,
and `jax.config.update("jax_platforms", ...)` after registration is not
reliable here (a bare `pytest tests` would otherwise run against the axon
TPU and hang).  Setting JAX_PLATFORMS=cpu and neutralising the axon pool
discovery before the import makes `python -m pytest tests` work unmodified.

Sharding logic is exercised on the virtual 8-device CPU mesh (the
reference's tier-2 strategy — identical results at any rank count,
SURVEY.md §4 — maps to identical results at any mesh shape).  fp64 is real
on CPU; the TPU backend would silently demote f64 and break the 1e-10
parity targets.
"""

import os
import sys

if "jax" in sys.modules:
    # The container's sitecustomize pre-imports jax in every process; that
    # is fine as long as no backend has been *initialized* yet (backends are
    # created lazily at the first jax.devices()/computation).  If one has,
    # the env vars below would be silently ignored — fail loudly instead.
    _xb = sys.modules["jax"]._src.xla_bridge
    if getattr(_xb, "_backends", None):
        raise RuntimeError(
            "a jax backend was initialized before tests/conftest.py ran; "
            "the CPU-platform env vars cannot take effect"
        )

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

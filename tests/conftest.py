"""Test configuration: run on the CPU backend with 8 virtual devices.

The container's sitecustomize registers the axon TPU plugin in every python
process and pins jax_platforms before conftest runs, so plain env vars are
not enough — override the config directly (this works post-registration) and
inject the virtual-device flag before the CPU client is created.

Sharding logic is exercised on the virtual 8-device CPU mesh (the
reference's tier-2 strategy — identical results at any rank count,
SURVEY.md §4 — maps to identical results at any mesh shape).  fp64 is real
on CPU; the TPU backend would silently demote f64 and break the 1e-10
parity targets.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

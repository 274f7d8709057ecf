"""Test configuration: force a real CPU backend with 8 virtual devices.

Two quirks of this environment are handled here:

  * the axon TPU-tunnel site (sitecustomize) calls
    ``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start,
    which silently routes *everything* — including "CPU" tests — through the
    single remote TPU. We re-update the config to plain ``cpu`` before any
    backend initialises.
  * ``xla_force_host_platform_device_count=8`` gives the 8-device virtual CPU
    mesh used by the multi-chip sharding tests — the JAX-native replacement
    for the fake distributed backend the reference lacks (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite compiles dozens of tiny-model programs
# on a 1-core box; caching makes re-runs take seconds instead of minutes
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

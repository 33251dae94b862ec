"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is tested on virtual CPU devices (the reference
never simulated multi-node; see SURVEY.md §4).  The session environment pins
a TPU platform via sitecustomize, so we must override through jax.config
*after* importing jax — env vars alone are ignored once the plugin registers.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True)
def _isolate_default_prng_impl():
    """Trainer construction calls select_prng_impl(), which flips the global
    jax_default_prng_impl (rbg by default).  Left leaked, every later test's
    PRNGKey draws change with suite ordering — numeric-tolerance tests then
    fail only under the full run (seen: test_fused_prologue_matches_unfused_
    serving).  Snapshot and restore around each test."""
    impl = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != impl:
        jax.config.update("jax_default_prng_impl", impl)

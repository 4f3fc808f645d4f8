"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip hardware is not available in CI; sharding/mesh tests run on a
virtual 8-device CPU mesh (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# explicit platform pin also skips the CLI's bounded accelerator probe
# (analyze/serve would otherwise spawn a probe child that touches the
# real TPU plugin from inside hermetic tests)
os.environ.setdefault("BIRDNET_TPU_PLATFORM", "cpu")

import jax  # noqa: E402

# The axon TPU plugin in this image overrides the JAX_PLATFORMS env var;
# the config flag is authoritative (must run before backend init).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    import jax

    return jax.random.PRNGKey(0)

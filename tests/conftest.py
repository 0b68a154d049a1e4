"""Test configuration: force a deterministic 8-device CPU mesh for JAX.

The environment's sitecustomize registers an `axon` TPU backend at
interpreter startup and pins JAX_PLATFORMS=axon, so env vars set here are
too late; instead the platform is overridden through jax.config before any
backend is initialized.  Multi-chip sharding is validated on this virtual
CPU mesh; the driver separately dry-runs the multichip path via
__graft_entry__.dryrun_multichip.
"""

import os

# Debug-build invariant checks (the analog of the reference's
# debug_assert!, off in production) always run under the test suite.
os.environ.setdefault("MATCHTIGS_DEBUG_CHECKS", "1")

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

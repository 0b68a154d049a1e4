"""Test configuration: force a deterministic 8-device CPU mesh for JAX.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware available in CI); the driver separately dry-runs the multichip
path via __graft_entry__.dryrun_multichip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

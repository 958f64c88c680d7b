"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU hardware is not required for correctness tests; multi-chip sharding logic
is exercised on XLA's host platform with 8 virtual devices (the same approach
the driver's dryrun uses).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

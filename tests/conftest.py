"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU hardware is not required for correctness tests; multi-chip sharding logic
is exercised on XLA's host platform with 8 virtual devices (the same approach
the driver's dryrun uses).

Note: the environment may pre-import jax with a TPU platform pinned via
JAX_PLATFORMS (sitecustomize), so env-var setdefault is not enough — we
override through jax.config, which takes effect as long as no backend has
been initialized yet.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

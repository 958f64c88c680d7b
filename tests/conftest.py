"""Test configuration: run everything on a virtual CPU device mesh.

TPU hardware is not required for correctness tests; multi-chip sharding logic
is exercised on XLA's host platform with virtual devices (the same approach
the driver's dryrun uses). The device count defaults to 8 and is
parametrized via ``GKT_TEST_DEVICES`` (e.g. ``GKT_TEST_DEVICES=32 python
tools/run_tests.py`` re-runs the whole suite on a 32-device mesh — tests
size their meshes with ``min(n, len(jax.devices()))``-style helpers or use
``make_mesh(n)`` with explicit small n, so larger counts stay valid).

Note: the environment may pre-import jax with a TPU platform pinned via
JAX_PLATFORMS (sitecustomize), so env-var setdefault is not enough — we
override through jax.config, which takes effect as long as no backend has
been initialized yet.
"""

import os

_n_dev = os.environ.get("GKT_TEST_DEVICES", "8")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={_n_dev}"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# --------------------------------------------------------------------------- #
# Single-process process-age SEGV mitigation experiment (see CLAUDE.md and
# tools/run_tests.py): a single pytest process over the whole suite SEGVs
# inside XLA's backend_compile after hundreds of CPU compilations.
# GKT_CLEAR_CACHES=1 drops every jit/pjit executable between test modules so
# the compile count per live-executable set stays bounded.
# --------------------------------------------------------------------------- #
if os.environ.get("GKT_CLEAR_CACHES"):
    import pytest

    @pytest.fixture(autouse=True, scope="module")
    def _gkt_clear_caches_per_module():
        yield
        jax.clear_caches()

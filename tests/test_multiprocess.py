"""Localhost multi-process distributed tests.

Spawns N real OS processes that join a ``jax.distributed`` cluster over
127.0.0.1 (CPU backend, multiple virtual XLA host devices per process) and
run the full distributed pipeline via tests/mp_worker.py. This is the only
coverage for the multi-host branch of ``put_global``
(``jax.make_array_from_callback``, parallel/distributed.py) and for
multi-host orbax checkpoint save/restore — every in-process test runs with
``jax.process_count() == 1``.

Skipped only if no TCP port can be bound (sandboxed environments).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_TESTS_DIR)
_WORKER = os.path.join(_TESTS_DIR, "mp_worker.py")


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(local_devices: int) -> dict:
    env = dict(os.environ)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={local_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    # append, never replace: the image's sitecustomize rides on PYTHONPATH
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_cluster(tmp_path, n_procs: int, local_devices: int, timeout: int = 420):
    try:
        port = _free_port()
    except OSError:
        pytest.skip("cannot bind a localhost TCP port")

    env = _worker_env(local_devices)
    procs = []
    logs = []
    for pid in range(n_procs):
        log = open(tmp_path / f"proc{pid}.log", "wb")
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [sys.executable, _WORKER, str(port), str(n_procs), str(pid), str(tmp_path)],
                env=env,
                stdout=log,
                stderr=subprocess.STDOUT,
                cwd=_REPO,
            )
        )
    try:
        codes = [p.wait(timeout=timeout) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        codes = None
    finally:
        for log in logs:
            log.close()

    def dump():
        out = []
        for pid in range(n_procs):
            text = (tmp_path / f"proc{pid}.log").read_bytes().decode(errors="replace")
            out.append(f"--- proc {pid} ---\n{text[-4000:]}")
        return "\n".join(out)

    assert codes is not None, f"cluster timed out\n{dump()}"
    assert codes == [0] * n_procs, f"worker exit codes {codes}\n{dump()}"

    results = []
    for pid in range(n_procs):
        with open(tmp_path / f"proc{pid}.json") as f:
            results.append(json.load(f))
    return results


@pytest.mark.parametrize(
    "n_procs,local_devices",
    [(2, 2), (4, 2)],
    ids=["2proc_x2dev", "4proc_x2dev"],
)
def test_multiprocess_pipeline_exact(tmp_path, n_procs, local_devices):
    results = _run_cluster(tmp_path, n_procs, local_devices)
    for pid, res in enumerate(results):
        assert res["ok"], f"proc {pid} reported failure: {res}"
        assert res["process_count"] == n_procs
        assert res["device_count"] == n_procs * local_devices
        assert res["mesh_devices"] == n_procs * local_devices
        assert res["ckpt_mesh_b_devices"] == n_procs
    # every process must agree on the replicated statistics
    assert all(r["iupac_k5"] == results[0]["iupac_k5"] for r in results)
    assert all(r["acgt_k9"] == results[0]["acgt_k9"] for r in results)

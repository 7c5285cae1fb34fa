"""Multi-process jax.distributed tests (SURVEY.md §5 mandate).

Two coordinated CPU processes x 4 virtual devices each = an 8-device
global mesh spanning a real process boundary — the structure of a
multi-host DCN deployment, minus the pod. The worker
(tests/_dist_worker.py) runs sharded BA, sharded matching, and the
partitioned pose-graph refinement against their single-device twins.

The partitioned pose graph also runs in-process on the virtual mesh
so plain CI covers it without subprocesses.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_dist_worker.py")


@pytest.mark.slow
def test_two_process_distributed():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)      # worker sets its own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n"
                    + "\n".join(o or "" for o in outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        for marker in ("BA_OK", "BA_PT_OK", "MATCH_OK", "POSEGRAPH_OK"):
            assert marker in out, f"worker {i} missing {marker}:\n{out}"


@pytest.mark.slow
def test_partitioned_posegraph_virtual_mesh():
    import jax
    from sift_tpu.parallel import default_mesh
    from sift_tpu.sfm import posegraph_dist
    assert len(jax.devices()) >= 8
    posegraph_dist.selftest(default_mesh(8))

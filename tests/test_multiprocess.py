"""2-process jax.distributed cluster test (VERDICT r1 item 6).

Spawns two real OS processes that form a jax.distributed CPU cluster
(2 virtual devices each, 4 global), exercising the exact multi-host
wiring train.py uses: env-driven initialize_distributed, the global
mesh over all processes' devices, and DeviceLoader's process-local
batch assembly. The reference has no distributed support of any kind
(SURVEY §2.9)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_mp_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cluster_loader_and_reduction():
    coord = f"127.0.0.1:{_free_port()}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "ITCVAE_COORDINATOR_ADDRESS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, coord, str(pid)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess child timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out}"
        assert f"mp-child {pid}: OK" in out

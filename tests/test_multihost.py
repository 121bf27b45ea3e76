"""Real 2-process multi-host launch: jax.distributed over CPU.

Spawns two worker processes (tests/multihost_worker.py) that join one
distributed runtime (4 virtual CPU devices each -> 8 global), feed
per-host frame shards, and run the fused batch Recognition over the
global mesh — the process model of BASELINE.json config 5 ("N >= 2
hosts") that the reference's single-process engine has no analog for."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_launch():
    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base["XLA_FLAGS"] = (env_base.get("XLA_FLAGS", "")
                             + " --xla_force_host_platform_device_count=4")
    env_base["FEALESS_COORDINATOR"] = f"127.0.0.1:{port}"
    env_base["FEALESS_NUM_PROCESSES"] = "2"

    procs = []
    for pid in range(2):
        env = dict(env_base, FEALESS_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py")],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=850)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-2000:]

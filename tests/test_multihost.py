"""2-process jax.distributed CPU simulation — the DCN (multi-host) code path.

The reference has no distributed runtime (SURVEY.md §2.9); this exercises the
TPU-native equivalent end-to-end without real hosts: two OS processes, each
with 2 virtual CPU devices, bootstrap through
``dist.mesh_setup.initialize_multihost`` and run cross-process collectives +
a DP train step (see ``tests/_multihost_worker.py``).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_process(worker_name: str, timeout: int = 240):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), worker_name)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outputs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outputs))
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "OK" in out, out


@pytest.mark.slow
def test_two_process_distributed_cpu():
    _run_two_process("_multihost_worker.py")


@pytest.mark.slow
def test_two_process_full_trainers():
    """Full CLI trainers across a 2-process mesh: train_normal
    --multihost --data-parallel and train_correspondence --multihost
    --graph-parallel (BASELINE config 5's code path, CPU-simulated)."""
    _run_two_process("_multihost_trainer_worker.py", timeout=420)

"""2-process jax.distributed training on localhost CPU.

Evidence for the multi-host story the single-process mesh dryrun cannot
give: real cross-process rendezvous + gloo collectives, per-process data
sharding through the Trainer, and rank-0-only checkpointing — exercising
the scripts/train_tpu_pod.sh code path (ref: nnUNetTrainerV2_DDP.py, which
the reference could never test without a GPU cluster)."""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_pair(worker, out, env):
    port = _free_port()
    procs = {
        pid: subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(out[pid])],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    }
    logs = {}
    for pid, p in procs.items():
        stdout, _ = p.communicate(timeout=280)
        logs[pid] = stdout
    return procs, logs


@pytest.mark.timeout(600)
def test_two_process_training_and_rank0_checkpoint(tmp_path):
    worker = Path(__file__).parent / "distributed_worker.py"
    out = {0: tmp_path / "rank0", 1: tmp_path / "rank1"}
    for d in out.values():
        d.mkdir()
    # the pytest conftest forces an 8-device virtual CPU platform via
    # XLA_FLAGS; the workers must see 1 local device per process
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs, logs = _run_pair(worker, out, env)
    if any(p.returncode != 0 for p in procs.values()):
        # the cross-process rendezvous + gloo heartbeats are sensitive to
        # CPU starvation on this 1-core host (observed: a run fails while
        # the TPU benches hog the core, then passes standalone) — one retry
        # keeps the signal without making the suite load-dependent
        procs, logs = _run_pair(worker, out, env)
    for pid, p in procs.items():
        assert p.returncode == 0, f"rank {pid} failed:\n{logs[pid]}"
        assert f"RANK{pid} OK" in logs[pid]

    # the global (psum'd) loss must agree bit-for-bit across ranks
    def losses(pid):
        m = re.search(rf"RANK{pid} LOSSES (.+)", logs[pid])
        assert m, logs[pid]
        return m.group(1).split()

    assert losses(0) == losses(1), f"rank loss divergence:\n{logs[0]}\n{logs[1]}"

    # rank-0-only checkpoint IO (ref: nnUNetTrainerV2_DDP.py:118)
    assert list(out[0].glob("model_*.msgpack")), "rank 0 wrote no checkpoint"
    assert not list(out[1].glob("model_*.msgpack")), "rank 1 must not write checkpoints"

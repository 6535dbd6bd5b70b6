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



def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_pair(worker, out, env, timeout=540):
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
    try:
        for pid, p in procs.items():
            stdout, _ = p.communicate(timeout=timeout)
            logs[pid] = stdout
    except subprocess.TimeoutExpired:
        for p in procs.values():
            p.kill()
            p.communicate()
        raise
    return procs, logs


def test_two_process_training_and_rank0_checkpoint(tmp_path):
    worker = Path(__file__).parent / "distributed_worker.py"
    out = {0: tmp_path / "rank0", 1: tmp_path / "rank1"}
    for d in out.values():
        d.mkdir()
    # the pytest conftest forces an 8-device virtual CPU platform via
    # XLA_FLAGS; the workers must see 1 local device per process
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    try:
        procs, logs = _run_pair(worker, out, env)
        failed = any(p.returncode != 0 for p in procs.values())
    except subprocess.TimeoutExpired:
        # two workers cold-compiling the train step on ONE core can blow
        # the pair timeout (observed on compile-cache misses); the retry
        # hits the now-warm cache
        failed = True
    if failed:
        # the cross-process rendezvous + gloo heartbeats are also sensitive
        # to CPU starvation on this 1-core host (observed: a run fails
        # while TPU benches hog the core, then passes standalone) — one
        # retry keeps the signal without making the suite load-dependent
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

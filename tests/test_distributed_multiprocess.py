"""Multi-process jax.distributed training on localhost CPU.

Evidence for the multi-host story the single-process mesh dryrun cannot
give: real cross-process rendezvous + gloo collectives, PROCESS-SPANNING
data sharding (2 processes x 4 virtual devices each = one 8-device data
axis), per-rank local-shard feeding through the Trainer, the in-step
global batch-dice reduction, and rank-0-only checkpointing — exercising
the scripts/train_tpu_pod.sh code path (ref: nnUNetTrainerV2_DDP.py, which
the reference could never test without a GPU cluster). A single-process
8-device run on the concatenated global batch is the ground truth the
multi-process run must reproduce.
"""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

DEVICES_PER_PROC = 4


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(n_devices: int) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    return env


def _run_pair(worker, out, env, timeout=540):
    port = _free_port()
    procs = {
        pid: subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(out[pid]), "2"],
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


def _parse(tag, pid, logs):
    m = re.search(rf"RANK{pid} {tag} (.+)", logs[pid])
    assert m, f"no {tag} line from rank {pid}:\n{logs[pid]}"
    return m.group(1).split()


@pytest.mark.slow
def test_two_process_training_and_rank0_checkpoint(tmp_path):
    worker = Path(__file__).parent / "distributed_worker.py"
    out = {0: tmp_path / "rank0", 1: tmp_path / "rank1"}
    for d in out.values():
        d.mkdir()
    env = _worker_env(DEVICES_PER_PROC)
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

    # the global (psum'd) loss and dice stats must agree bit-for-bit
    # across ranks — they are outputs of the same sharded program
    for tag in ("LOSSES", "VAL"):
        assert _parse(tag, 0, logs) == _parse(tag, 1, logs), (
            f"rank divergence on {tag}:\n{logs[0]}\n{logs[1]}"
        )

    # rank-0-only checkpoint IO (ref: nnUNetTrainerV2_DDP.py:118)
    assert list(out[0].glob("model_*.msgpack")), "rank 0 wrote no checkpoint"
    assert not list(out[1].glob("model_*.msgpack")), "rank 1 must not write checkpoints"

    # ground truth: a SINGLE process with the same 8-device data axis
    # training on the concatenated global batch must see the same losses
    # and global batch-dice statistics as the 2-process run
    single_out = tmp_path / "single"
    single_out.mkdir()
    sp = subprocess.run(
        [sys.executable, str(worker), "0", "0", str(single_out), "1"],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=_worker_env(2 * DEVICES_PER_PROC),
        timeout=540,
    )
    assert sp.returncode == 0, f"single-process worker failed:\n{sp.stdout}"
    slogs = {0: sp.stdout}
    for tag in ("LOSSES", "VAL"):
        multi = np.array([float(x) for x in _parse(tag, 0, logs) if x != "DICESTATS"])
        single = np.array([float(x) for x in _parse(tag, 0, slogs) if x != "DICESTATS"])
        # same global program over the same global data; only collective
        # implementation (gloo cross-process vs in-process) may reorder
        # float reductions
        np.testing.assert_allclose(multi, single, rtol=1e-5, atol=1e-7, err_msg=tag)

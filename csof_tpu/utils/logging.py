"""Training observability: timestamped log files, progress plots, summaries.

Capability parity with the reference's logging
(ref: nnunet/training/network_training/network_trainer.py:236-268
`print_to_log_file` with retry; `plot_progress:198` matplotlib loss/metric
curves; debug.json dump at ref: nnUNetTrainer.py:448) and param counting
(ref: vendored nnunet/torchinfo).
"""

from __future__ import annotations

import datetime
import json
import time
from pathlib import Path

import numpy as np


class TrainingLog:
    """Timestamped text log with IO-retry (ref: network_trainer.py:252-266)."""

    def __init__(self, folder: str | Path, also_print: bool = True):
        self.folder = Path(folder)
        self.folder.mkdir(parents=True, exist_ok=True)
        ts = datetime.datetime.now()
        self.file = self.folder / (
            f"training_log_{ts.year}_{ts.month}_{ts.day}_{ts.hour:02d}_{ts.minute:02d}_{ts.second:02d}.txt"
        )
        self.also_print = also_print

    def __call__(self, *args, add_timestamp: bool = True):
        msg = " ".join(str(a) for a in args)
        if add_timestamp:
            msg = f"{datetime.datetime.now()}: {msg}"
        for attempt in range(5):
            try:
                with open(self.file, "a") as f:
                    f.write(msg + "\n")
                break
            except OSError:
                time.sleep(0.5)
        if self.also_print:
            print(msg)


def plot_progress(
    folder: str | Path,
    train_losses: list[float],
    val_losses: list[float] | None = None,
    eval_metrics: list[float] | None = None,
    fname: str = "progress.png",
):
    """Loss/metric curves -> progress.png (ref: network_trainer.py:198-235)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 6))
    xs = np.arange(1, len(train_losses) + 1)
    ax.plot(xs, train_losses, color="b", ls="-", label="loss_tr")
    if val_losses:
        ax.plot(np.arange(1, len(val_losses) + 1), val_losses, color="r", ls="-", label="loss_val")
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    if eval_metrics:
        ax2 = ax.twinx()
        ax2.plot(np.arange(1, len(eval_metrics) + 1), eval_metrics, color="g", ls="--", label="fg dice")
        ax2.set_ylabel("evaluation metric")
        ax2.legend(loc=1)
    ax.legend(loc=2)
    out = Path(folder) / fname
    fig.savefig(out)
    plt.close(fig)
    return out


def dump_debug_json(folder: str | Path, obj: dict, fname: str = "debug.json"):
    """Dump trainer state/attrs (ref: nnUNetTrainer.py:448)."""
    def conv(o):
        if isinstance(o, (np.ndarray, np.generic)):
            return np.asarray(o).tolist()
        if isinstance(o, Path):
            return str(o)
        return str(o)

    Path(folder).mkdir(parents=True, exist_ok=True)
    (Path(folder) / fname).write_text(json.dumps(obj, indent=2, default=conv))


def count_parameters(params) -> int:
    """Total parameter count of a flax pytree (torchinfo's headline number,
    ref: nnunet/torchinfo used by trainers' count_parameters)."""
    import jax

    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def model_summary(params, indent: int = 0) -> str:
    """Hierarchical param-shape summary (torchinfo-style table)."""
    lines = []

    def walk(node, prefix):
        if hasattr(node, "items"):
            for k, v in node.items():
                if hasattr(v, "items"):
                    lines.append("  " * len(prefix) + f"{k}/")
                    walk(v, prefix + [k])
                else:
                    n = int(np.prod(v.shape))
                    lines.append("  " * len(prefix) + f"{k}: {tuple(v.shape)} = {n:,}")
        return lines

    walk(params, [])
    lines.append(f"total params: {count_parameters(params):,}")
    return "\n".join(lines)

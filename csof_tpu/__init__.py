"""csof_tpu — TPU-native cardiac segmentation + optical-flow + strain framework.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
nnU-Net-fork cardiac pipeline `nicolas1805961/Cardiac-Segmentation-Optical-flow`
(mounted read-only at /root/reference; cited throughout as ``ref:<path>:<line>``).

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

- :mod:`csof_tpu.config`      — typed plans/experiment configs (ref: plans pkl + video.yaml)
- :mod:`csof_tpu.utils`       — NIfTI IO, pickle/json helpers, logging
- :mod:`csof_tpu.ops`         — pure jittable array ops + Pallas kernels
- :mod:`csof_tpu.models`      — flax model zoo (U-Net, RAFT, VoxelMorph, SegFlow)
- :mod:`csof_tpu.data`        — offline data plane (crop/analyze/plan/preprocess) + loaders
- :mod:`csof_tpu.parallel`    — mesh/sharding/collectives (replaces DP/DDP+NCCL)
- :mod:`csof_tpu.training`    — trainers, schedules, checkpointing (orbax)
- :mod:`csof_tpu.inference`   — batched sliding-window + flow prediction, export
- :mod:`csof_tpu.evaluation`  — metrics, evaluator, postprocessing
- :mod:`csof_tpu.analysis`    — jacobian/strain/SSIM analysis CLIs
"""

__version__ = "0.1.0"

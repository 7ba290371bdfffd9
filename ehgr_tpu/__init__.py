"""ehgr_tpu — TPU-native framework for Efficient Hand-Gesture Recognition.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`peter0512lee/Efficient-Hand-Gesture-Recognition-using-Multi-Task-Multi-Modal-
Learning-and-Self-Distillation` (MMAsia 2023): multi-task multi-modal (MTMM)
training with next-segment depth supervision, BYOT-style self-distillation (SD)
with early-exit deployment models, ACTION/TSM temporal modules on 2D backbones,
and the multi-clip TSN evaluation protocol — built TPU-first:

* ``[N, T, H, W, C]`` tensor convention (NHWC convs for the MXU).
* Pure-functional models (flax.linen) under a single jitted train step.
* Data parallelism over a ``jax.sharding.Mesh`` with XLA collectives; optional
  tensor-parallel classifier heads (see ``ehgr_tpu.parallel``).
* Temporal shift as T-axis slice/concat fused by XLA, with a Pallas kernel
  variant for the fused shift (``ehgr_tpu.ops.pallas``).

Layer map mirrors SURVEY.md §1: ``data`` (L0/L1), ``models`` (L2–L4),
``ops`` (L3), ``train``/``eval`` (L5), ``parallel``/``utils`` cross-cutting.
"""

__version__ = "0.1.0"

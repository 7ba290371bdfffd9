"""Mesh & sharding runtime — new first-class components (SURVEY.md §2.4).

The reference is strictly single-GPU (no DDP/NCCL anywhere,
``train_mtmm.py:106-107``); on TPU, data parallelism over clips and optional
tensor-parallel classifier heads ride a ``jax.sharding.Mesh`` with XLA
collectives inserted by GSPMD."""

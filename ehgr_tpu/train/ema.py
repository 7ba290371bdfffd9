"""Model EMA as a pure tree-map.

Reference: ``EMAWrapper`` (``train_mtmm.py:110-140``) — a deepcopied model
whose ENTIRE state_dict (params *and* BN running stats) is blended per step
with decay 0.9999 (0.999 for NvGesture).  Here the EMA is just another
variable tree updated inside the jitted train step — no copies, no Python
loop over tensors."""

from __future__ import annotations

import jax


def ema_update(ema_tree, new_tree, decay: float):
    """``ema = decay * ema + (1 - decay) * new`` over all leaves."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                        ema_tree, new_tree)

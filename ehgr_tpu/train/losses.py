"""Loss functions for the three training stages.

Numerics replicated exactly (SURVEY.md §7 "hard parts" (e)):

* cross entropy      — mean CE over the batch (torch CrossEntropyLoss).
* KD                 — ``-mean(sum(log_softmax(mid/T) * softmax(final/T)))``
                       scaled by T^2, teacher detached
                       (``train_sd.py:176-188, 237-248``).
* feature hint       — masked-L2 **sum** (not mean!):
                       ``sum(|(f-t)^2 * [(f>0) or (t>0)]|)`` vs the detached
                       final pooled feature (``train_sd.py:191-193``).
* depth              — mean MSE on sigmoid depth vs GT resized to 56^2,
                       weight 0.01 (``train_mtmm.py:223-231``).
* SD total           — ``(1-a)*sum(CE) + a*sum(KD) + b*sum(feat)`` with
                       a=0.1, b=1e-6, T=3 (``train_sd.py:69-75, 262-264``).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def kd_loss(mid_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
            temperature: float = 3.0) -> jnp.ndarray:
    """Soft-label distillation vs the detached final head, already scaled by
    T^2 as the reference applies it (``train_sd.py:237-248``)."""
    teacher = jax.nn.softmax(
        jax.lax.stop_gradient(teacher_logits) / temperature, axis=-1)
    logp = jax.nn.log_softmax(mid_logits / temperature, axis=-1)
    return -jnp.mean(jnp.sum(logp * teacher, axis=1)) * (temperature ** 2)


def feature_hint_loss(fea: jnp.ndarray, target_fea: jnp.ndarray) -> jnp.ndarray:
    """Masked-L2 SUM against the detached teacher feature."""
    t = jax.lax.stop_gradient(target_fea)
    mask = jnp.logical_or(fea > 0, t > 0).astype(fea.dtype)
    return jnp.sum(jnp.abs((fea - t) ** 2 * mask))


def depth_loss(depth_pred: jnp.ndarray, depth_gt: jnp.ndarray) -> jnp.ndarray:
    """Mean MSE, ``[NT, 56, 56, 1]`` sigmoid outputs vs [0,1] targets."""
    return jnp.mean((depth_pred - depth_gt) ** 2)


def mtmm_total(logits, labels, depth_pred, depth_gt,
               depth_weight: float = 0.01) -> Tuple[jnp.ndarray, Dict]:
    ce = cross_entropy(logits, labels)
    dl = depth_loss(depth_pred, depth_gt)
    return ce + depth_weight * dl, {"ce": ce, "depth": dl}


def sd_total(output, mids: Sequence[jnp.ndarray], labels,
             final_fea, mid_feas: Sequence[jnp.ndarray],
             alpha: float = 0.1, beta: float = 1e-6,
             temperature: float = 3.0) -> Tuple[jnp.ndarray, Dict]:
    ce = cross_entropy(output, labels)
    mid_ces = [cross_entropy(m, labels) for m in mids]
    kds = [kd_loss(m, output, temperature) for m in mids]
    feats = [feature_hint_loss(f, final_fea) for f in mid_feas]
    total = ((1.0 - alpha) * (ce + sum(mid_ces))
             + alpha * sum(kds) + beta * sum(feats))
    aux = {"ce": ce, "mid_ce": jnp.stack(mid_ces), "kd": jnp.stack(kds),
           "feat": jnp.stack(feats)}
    return total, aux


def mtmm_sd_total(output, mids, labels, final_fea, mid_feas,
                  depth_pred, depth_gt, alpha: float = 0.1,
                  beta: float = 1e-6, temperature: float = 3.0,
                  depth_weight: float = 0.01) -> Tuple[jnp.ndarray, Dict]:
    """Joint stage: SD losses + current-clip depth MSE
    (``train_mtmm_sd.py``; note the joint stage supervises the CURRENT clip's
    depth, unlike stage-1's next-segment target — SURVEY.md §2.3)."""
    total, aux = sd_total(output, mids, labels, final_fea, mid_feas,
                          alpha=alpha, beta=beta, temperature=temperature)
    dl = depth_loss(depth_pred, depth_gt)
    aux["depth"] = dl
    return total + depth_weight * dl, aux

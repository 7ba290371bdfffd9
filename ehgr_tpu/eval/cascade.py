"""Confidence-gated early-exit CASCADE — a dynamic deployment surface.

The reference deploys ONE truncated model chosen offline
(``models_SD.py:434-1232``: ``TSN_Middle1/2/3`` are static accuracy/compute
points).  The cascade turns the SD exits into an operating CURVE: every
video is scored by the cheap exit-K deploy model, and only videos whose
vote confidence (max of the clip-averaged probability) falls below a
threshold escalate to the full network's final head.

TPU-first mechanics (XLA traces once per shape — no data-dependent shapes
inside jit):

* both stages are plain jitted ``[V, K, T, H, W, C] -> [V, C]`` score fns
  (``eval/inference.make_score_fn`` — same protocol as ``test.py``);
* escalation batching happens on the HOST: escalated videos are gathered
  and padded to power-of-two buckets, so the full model compiles at most
  ``log2(max_batch)`` programs no matter how many videos escalate;
* threshold sweeps are free: exit and full probabilities are computed once
  per video and the whole accuracy/escalation curve is evaluated
  analytically (``sweep_thresholds``), while ``execute_cascade`` runs the
  real two-pass path for a chosen threshold (tests pin the two equal).

Weights: both stages load from ONE ``tsn_sd`` checkpoint — the exit stage
is ``tsn_middle{K}`` (backbone prefix + scala-K + middle_fcK) and the full
stage is plain ``tsn`` (full backbone + ``new_fc``), i.e. the SD net's
final head without its exit branches, which the deploy path never needs.
"""

from __future__ import annotations

from typing import Dict, Iterable, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ehgr_tpu.eval.inference import make_score_fn

DEFAULT_THRESHOLDS = (0.0, 0.3, 0.5, 0.7, 0.8, 0.9, 0.95, 0.99, 1.1)


def bucket_size(n: int, cap: int) -> int:
    """Smallest power of two >= n, capped at ``cap`` (the pass-1 batch)."""
    if n <= 0:
        return 0
    b = 1
    while b < n and b < cap:
        b *= 2
    return min(b, cap)


def build_cascade_score_fns(model_exit, vars_exit, model_full, vars_full,
                            **score_kw) -> Tuple:
    """(score_exit, score_full): jitted [V,K,T,H,W,C] -> [V,C] prob fns."""
    return (make_score_fn(model_exit, vars_exit, **score_kw),
            make_score_fn(model_full, vars_full, **score_kw))


def execute_cascade(score_exit, score_full, frames_u8: np.ndarray,
                    threshold: float) -> Dict[str, np.ndarray]:
    """Run the REAL two-pass cascade on one video batch.

    Pass 1 scores every video with the exit model; videos with
    ``max(prob) < threshold`` are gathered (host-side), padded to a
    power-of-two bucket, and re-scored by the full model.  Returns
    per-video probs, predictions, and the escalation mask.
    """
    v = frames_u8.shape[0]
    p_exit = np.asarray(score_exit(jnp.asarray(frames_u8)))
    conf = p_exit.max(axis=-1)
    esc = conf < threshold
    probs = p_exit.copy()
    if esc.any():
        idx = np.nonzero(esc)[0]
        b = bucket_size(len(idx), v)
        pad = np.concatenate([idx, np.zeros(b - len(idx), np.int64)]) \
            if b > len(idx) else idx[:b]
        p_full = np.asarray(score_full(jnp.asarray(frames_u8[pad])))
        probs[idx] = p_full[: len(idx)]
    return {"probs": probs, "pred": probs.argmax(-1), "escalated": esc,
            "exit_conf": conf}


def collect_scores(score_exit, score_full,
                   batches: Iterable) -> Dict[str, np.ndarray]:
    """Score every ``(frames_u8, labels)`` batch through BOTH stages once.

    The returned arrays make any threshold's cascade a pure host
    computation (``sweep_thresholds``)."""
    pe, pf, ys = [], [], []
    for frames, labels in batches:
        f = jnp.asarray(frames)
        pe.append(np.asarray(score_exit(f)))
        pf.append(np.asarray(score_full(f)))
        ys.append(np.asarray(labels))
    return {"p_exit": np.concatenate(pe), "p_full": np.concatenate(pf),
            "label": np.concatenate(ys)}


def sweep_thresholds(scores: Dict[str, np.ndarray],
                     thresholds: Sequence[float],
                     rate_exit: float = 0.0,
                     rate_full: float = 0.0) -> list:
    """The cascade operating curve from one ``collect_scores`` pass.

    Per threshold: top-1, escalated fraction, and (when per-stage measured
    rates are supplied) the effective serving rate
    ``1 / (1/rate_exit + frac/rate_full)`` — every clip pays the exit,
    escalated clips additionally pay the full model."""
    p_exit, p_full, y = scores["p_exit"], scores["p_full"], scores["label"]
    conf = p_exit.max(-1)
    pred_exit, pred_full = p_exit.argmax(-1), p_full.argmax(-1)
    rows = []
    for tau in thresholds:
        esc = conf < tau
        pred = np.where(esc, pred_full, pred_exit)
        row = {"threshold": float(tau),
               "top1": 100.0 * float((pred == y).mean()),
               "escalated_pct": 100.0 * float(esc.mean())}
        if rate_exit > 0 and rate_full > 0:
            row["effective_clips_per_sec"] = round(
                1.0 / (1.0 / rate_exit + float(esc.mean()) / rate_full), 1)
        rows.append(row)
    return rows


def run_cascade_test(cfg, exit_k: int = 1,
                     thresholds: Sequence[float] = DEFAULT_THRESHOLDS,
                     rate_exit: float = 0.0, rate_full: float = 0.0) -> Dict:
    """Protocol-shaped cascade evaluation (the ``cli/test_cascade`` verb).

    Loads ONE ``tsn_sd`` checkpoint into both stages, scores the multi-clip
    test protocol through each once, and returns the threshold operating
    curve plus a real two-pass execution of the middle threshold (proving
    the bucketed serving path, not just the analytic combine)."""
    from ehgr_tpu.data.factory import build_test_dataset
    from ehgr_tpu.data.pipeline import Loader
    from ehgr_tpu.eval.runner import _build_model

    m_exit, v_exit = _build_model(cfg, f"tsn_middle{exit_k}")
    m_full, v_full = _build_model(cfg, "tsn")
    score_exit, score_full = build_cascade_score_fns(
        m_exit, v_exit, m_full, v_full,
        scale_size=cfg.data.scale_size, crop_size=cfg.data.crop_size,
        square_resize=True, dtype_name=cfg.model.dtype)

    dataset = build_test_dataset(cfg)
    loader = Loader(dataset, batch_size=max(1, 8 // cfg.data.clip_num or 1),
                    shuffle=False, num_workers=cfg.data.num_workers,
                    drop_last=False)
    t = cfg.model.num_segments

    def batches():
        for b in loader:
            rgb = np.asarray(b["rgb"])          # [V, K, crops*T, H, W, C]
            v, k, ct = rgb.shape[:3]
            crops = ct // t
            # crops fold into the clip-vote axis (eval/runner.py protocol)
            rgb = rgb.reshape((v, k * crops, t) + rgb.shape[3:])
            yield rgb, np.asarray(b["label"])

    first = next(iter(batches()))
    scores = collect_scores(score_exit, score_full, batches())
    curve = sweep_thresholds(scores, thresholds, rate_exit, rate_full)

    tau = float(np.median(scores["p_exit"].max(-1)))
    run = execute_cascade(score_exit, score_full, first[0], tau)
    y = scores["label"]
    return {"exit": exit_k, "n_videos": int(len(y)),
            "top1_exit_only": 100.0 * float(
                (scores["p_exit"].argmax(-1) == y).mean()),
            "top1_full_only": 100.0 * float(
                (scores["p_full"].argmax(-1) == y).mean()),
            "curve": curve,
            "two_pass_check": {
                "threshold": tau,
                "escalated": int(run["escalated"].sum()),
                "of": int(first[0].shape[0])}}

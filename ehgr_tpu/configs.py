"""Typed configuration tree for the ehgr_tpu framework.

The reference spreads hyperparameters across per-script argparse flags, a
mutable ``params`` dict, and shell recipes (``/root/reference/sh/train_ego.sh:4-20``,
``sh/train_nv.sh:2-8``).  Here there is ONE dataclass tree with named presets
that reproduce those recipes exactly; every trainer/evaluator consumes a
``Config`` and nothing else.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class DataConfig:
    """Dataset + input pipeline settings (reference L0/L1)."""

    dataset: str = "EgoGesture"          # 'EgoGesture' | 'NvGesture' | 'synthetic'
    annot_path: str = ""                 # dir holding {train,val,test,...}.pkl
    clip_len: int = 8                    # T, frames per clip (--clip_len)
    batch_size: int = 8                  # clips per global batch (--batch_size)
    num_classes: int = 83                # 83 EgoGesture / 25 NvGesture
    # spatial pipeline (reference: GroupScale/GroupCenterCrop/GroupNormalize)
    scale_size: int = 224                # resize short side / square (per dataset)
    crop_size: int = 224                 # TEST-protocol crop (test.py:204-221)
    # train/val crop when it differs from the test crop: NvGesture trains on
    # scale 256 -> MultiScaleCrop 224 but tests on 256 crops
    # (train_mtmm.py:469-486 vs sh/test_nv.sh:2-8); None = same as crop_size
    train_crop_size: Optional[int] = None

    @property
    def train_crop(self) -> int:
        return self.train_crop_size or self.crop_size
    # ImageNet statistics (models_MTMM.py:124-125)
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    # test protocol (test.py:204-244, sh/test_*.sh)
    clip_num: int = 10                   # clips per video at test time
    test_crops: int = 1                  # 1 (Ego) | 3 | 10 (Nv variants)
    num_workers: int = 4
    seed: int = 0
    # host pipeline: 'pil' decodes with PIL; 'native' uses the C++ fused
    # decode->resize->crop library (bit-exact vs PIL, PIL fallback per clip);
    # 'synthetic' generates random frames
    backend: str = "pil"
    # synthetic backend only: 'random' = class-biased noise clips (fast,
    # shape/compile coverage); 'motion' = LearnableClipSource moving-patch
    # clips whose label encodes motion direction (+ color) — the
    # end-to-end learnability proof task; 'motion_hard' = the
    # discriminative variant (white target among colored distractors,
    # dir x speed labels) whose SD exit accuracies order strictly
    synthetic_task: str = "random"
    synthetic_videos: int = 64
    # motion_hard difficulty knobs (data/synthetic.py): train uses a
    # 0..K distractor mixture, eval renders exactly K; occlude hides the
    # target for N frames per clip
    synthetic_distractors: int = 2
    synthetic_occlude: int = 0


@dataclass(frozen=True)
class ModelConfig:
    """Model family + backbone settings (reference L2-L4)."""

    arch: str = "tsn"                    # tsn | tsn_mtmm | tsn_sd | tsn_mtmm_sd |
                                         # tsn_middle{1,2,3} | r2plus1d | slowonly
    base_model: str = "resnet50"         # resnet50 | resnet101 | mobilenet_v2 |
                                         # bn_inception | res2net50
    num_segments: int = 8                # T at model level (== clip_len)
    num_classes: int = 83
    modality: str = "RGB"                # RGB | Flow | RGBDiff
    modal: str = "rgb"                   # rgb | rgb_depth | (+_skeleton/_text for mtmm_sd)
    consensus_type: str = "avg"
    dropout: float = 0.5
    # partial-BN capability exists (models_MTMM.py:159-175) but the reference
    # recipes never pass --npb, so the headline runs train ALL BNs
    # (train_mtmm.py:67,557) — default False matches them.
    partial_bn: bool = False
    # temporal module injected on conv1 of residual blocks
    is_shift: bool = True
    temporal_module: str = "action"      # 'action' | 'tsm' | 'none'
    shift_div: int = 8
    shift_place: str = "blockres"
    temporal_pool: bool = False          # halve T after stage 2 (--tpool)
    before_softmax: bool = True          # False = prob-space consensus
    fc_lr5: bool = True                  # classifier head gets lr x5 / bias x10
    pretrain: str = "imagenet"           # 'imagenet' expects a converted ckpt; '' = random
    # per-block activation rematerialization for large-batch training
    remat: bool = False
    # ACTION kernel mode: 'vjp' (default) = custom-VJP gate block at train
    # (the round-4 fused backward, ops/action_vjp.py: 108.5 vs 104 clips/s
    # on chip) with the pure-XLA path at eval; None/'' (XLA everywhere) |
    # 'prologue' | 'mega' (two-sweep Pallas megakernel,
    # ehgr_tpu/ops/pallas/action_mega.py).  Default 'vjp' so real training
    # runs match the benched backward (ADVICE r4).
    action_fused: Optional[str] = "vjp"
    # int8 MXU inference for backbone convs (ops/quantize.py; eval only,
    # resnet-only): False | 'dynamic' | 'static' (needs a calibration
    # pass; see ops/quantize.calibrate).  Measured: docs/PERF.md.
    quantize: object = False
    # ACTION placement (the paper's accuracy/compute knob; measured
    # docs/PERF.md: (4,) 2.7x, (3,4) 1.8x inference vs full placement)
    action_stages: Tuple[int, ...] = (1, 2, 3, 4)
    # compute dtype for the backbone (params stay f32)
    dtype: str = "bfloat16"
    # videomae only: (dim, depth, heads) override; None = ViT-B/16 (the
    # reference's VideoMAEForVideoClassification).  Tiny values make the
    # training path testable on CPU.
    vit: Optional[Tuple[int, int, int]] = None


@dataclass(frozen=True)
class OptimConfig:
    """SGD + 9-group lr/decay policy + step decay (models_MTMM.py:180-266, utils.py:39-46)."""

    lr: float = 0.00125
    momentum: float = 0.9
    weight_decay: float = 1e-5
    lr_steps: Tuple[int, ...] = (10, 15, 20)   # epochs at which lr *= 0.1
    gamma: float = 0.1
    epochs: int = 25
    # --clip_gradient is declared but never applied in the reference
    # trainers; None matches the actual runs
    clip_gradient: Optional[float] = None
    ema_decay: float = 0.9999                  # 0.999 for NvGesture (sh/train_nv.sh:5)
    # False = single param group (train_slowonly.py's plain SGD); True = the
    # 9-group lr/decay policy walk (models_MTMM.py:180-266)
    policies: bool = True
    # >1 = gradient accumulation: split each batch into this many scanned
    # microbatches, one optimizer/EMA update per batch (effective batches
    # beyond the single-pass HBM wall; train/steps.py)
    accum_steps: int = 1


@dataclass(frozen=True)
class LossConfig:
    """MTMM + SD loss weights (train_mtmm.py:223-231, train_sd.py:69-75,262-264)."""

    depth_weight: float = 0.01        # CE + w * MSE(depth)
    depth_size: int = 56              # GT depth resized to 56x56 for the global decoder
    temperature: float = 3.0          # KD softmax temperature
    alpha: float = 0.1                # KD mixing: (1-a)*CE + a*KD
    beta: float = 1e-6                # feature-hint weight


@dataclass(frozen=True)
class ParallelConfig:
    """Device mesh layout (new component, SURVEY.md §2.4)."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1           # >1 shards classifier heads over 'model'
    donate_state: bool = True


@dataclass(frozen=True)
class RunConfig:
    """Logging / checkpoint housekeeping (reference runs/ layout)."""

    run_dir: str = "runs"
    model_name: str = "ACTION_resnet50"
    display: int = 100                # log every N steps
    save_depth_images: bool = False   # dump depth-pred JPEGs like train_mtmm.py:267-271
    seed: int = 0
    checkpoint_path: str = ""         # resume / stage-1 weights (--checkpoint_path)
    # True: restore the FULL TrainState (optimizer momentum, EMA, step
    # counter) from an orbax checkpoint — real crash-resume, which the
    # reference's --resume (weights-only state_dict) cannot do
    resume_full: bool = False
    # True: defer checkpoint WRITES to end-of-training (best/ema_best are
    # tracked as host copies, latest written once).  The per-epoch orbax
    # save + full-state device_get costs 40-60 s/epoch through the TPU
    # tunnel (round-5 probe: ~5 s of actual training in a 50-75 s epoch) —
    # for short sweeps/rehearsals the crash-resume granularity isn't worth
    # 10x wall clock.  On-disk artifacts at completion are identical.
    ckpt_light: bool = False


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    run: RunConfig = field(default_factory=RunConfig)

    def replace(self, **kw) -> "Config":
        return replace(self, **kw)

    def validate(self) -> "Config":
        assert self.data.clip_len == self.model.num_segments, (
            "clip_len must equal num_segments")
        assert self.data.num_classes == self.model.num_classes
        assert self.model.temporal_module in ("action", "tsm", "none")
        assert self.model.arch in (
            "tsn", "tsn_mtmm", "tsn_sd", "tsn_mtmm_sd",
            "tsn_middle1", "tsn_middle2", "tsn_middle3",
            "r2plus1d", "r2plus1d_mtmm", "slowonly", "videomae")
        return self


# ---------------------------------------------------------------------------
# Presets reproducing the reference shell recipes.
# ---------------------------------------------------------------------------

def _ego_base(**model_kw) -> Config:
    """sh/train_ego.sh: lr 0.00125, wd 1e-5, dropout .5, bs 8, 8 frames,
    epochs 25, lr_steps (10,15,20), resnet50+ACTION."""
    return Config(
        data=DataConfig(dataset="EgoGesture", num_classes=83,
                        scale_size=224, crop_size=224, test_crops=1),
        model=ModelConfig(num_classes=83, **model_kw),
        optim=OptimConfig(epochs=25, lr_steps=(10, 15, 20)),
    )


def _nv_base(**model_kw) -> Config:
    """sh/train_nv.sh: epochs 80, lr_steps (50,60,70), ema 0.999, 3-crop 256 test."""
    return Config(
        data=DataConfig(dataset="NvGesture", num_classes=25,
                        scale_size=256, crop_size=256, train_crop_size=224,
                        test_crops=3),
        model=ModelConfig(num_classes=25, **model_kw),
        optim=OptimConfig(epochs=80, lr_steps=(50, 60, 70), ema_decay=0.999),
    )


PRESETS = {
    # EgoGesture
    "ego_baseline": _ego_base(arch="tsn"),
    "ego_mtmm": _ego_base(arch="tsn_mtmm", modal="rgb_depth"),
    "ego_sd": _ego_base(arch="tsn_sd"),
    "ego_mtmm_sd": _ego_base(arch="tsn_mtmm_sd", modal="rgb_depth"),
    # NvGesture
    "nv_baseline": _nv_base(arch="tsn"),
    "nv_mtmm": _nv_base(arch="tsn_mtmm", modal="rgb_depth"),
    "nv_sd": _nv_base(arch="tsn_sd"),
    "nv_mtmm_sd": _nv_base(arch="tsn_mtmm_sd", modal="rgb_depth"),
}


def get_preset(name: str) -> Config:
    cfg = PRESETS[name]
    return cfg.validate()


def config_from_args(argv: Sequence[str], default_preset: str = "ego_baseline") -> Config:
    """Small argparse shim so the CLI verbs keep the reference's flag names."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--preset", default=default_preset, choices=sorted(PRESETS))
    p.add_argument("--dataset", default=None)
    p.add_argument("--annot_path", default=None)
    p.add_argument("--clip_len", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--wd", type=float, default=None)
    p.add_argument("--dropout", type=float, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr_steps", type=int, nargs="+", default=None)
    p.add_argument("--base_model", default=None)
    p.add_argument("--is_shift", action="store_true", default=None)
    p.add_argument("--shift_div", type=int, default=None)
    p.add_argument("--modal", default=None)
    p.add_argument("--model_name", default=None)
    p.add_argument("--ema_decay", type=float, default=None)
    p.add_argument("--synthetic", action="store_true", default=False)
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--clip_num", type=int, default=None)
    p.add_argument("--test_crops", type=int, default=None)
    p.add_argument("--scale_size", type=int, default=None)
    p.add_argument("--crop_size", type=int, default=None)
    p.add_argument("--train_crop_size", type=int, default=None)
    # round-2 performance knobs (docs/PERF.md)
    p.add_argument("--backend", default=None,
                   choices=["pil", "native", "native_fast"],
                   help="host decode path (native = C++ fused decoder)")
    p.add_argument("--action_fused", default=None,
                   choices=["prologue", "mega", "vjp", "none"],
                   help="ACTION kernel mode (default: config 'vjp' = "
                        "fused backward at train, XLA at eval)")
    p.add_argument("--action_stages", type=int, nargs="+", default=None,
                   help="stages carrying ACTION (placement ablation)")
    p.add_argument("--quantize", default=None,
                   choices=["dynamic", "static"],
                   help="int8 MXU inference for backbone convs")
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--run_dir", default=None)
    p.add_argument("--synthetic_videos", type=int, default=None)
    p.add_argument("--vit", type=int, nargs=3, default=None,
                   metavar=("DIM", "DEPTH", "HEADS"),
                   help="videomae encoder size override (default ViT-B/16)")
    p.add_argument("--accum_steps", type=int, default=None,
                   help="gradient accumulation: microbatches per step")
    args = p.parse_args(argv)

    cfg = get_preset(args.preset)
    d, m, o, r = cfg.data, cfg.model, cfg.optim, cfg.run

    def upd(obj, **kw):
        kw = {k: v for k, v in kw.items() if v is not None}
        return replace(obj, **kw) if kw else obj

    d = upd(d, dataset=args.dataset, annot_path=args.annot_path,
            clip_len=args.clip_len, batch_size=args.batch_size,
            clip_num=args.clip_num, test_crops=args.test_crops,
            scale_size=args.scale_size, crop_size=args.crop_size,
            train_crop_size=args.train_crop_size, backend=args.backend,
            num_classes=args.num_classes,
            synthetic_videos=args.synthetic_videos)
    if args.synthetic:
        d = replace(d, backend="synthetic")
    m = upd(m, base_model=args.base_model, shift_div=args.shift_div,
            modal=args.modal, dropout=args.dropout,
            num_segments=args.clip_len, action_fused=args.action_fused,
            quantize=args.quantize, num_classes=args.num_classes,
            action_stages=(tuple(args.action_stages)
                           if args.action_stages else None),
            vit=tuple(args.vit) if args.vit else None)
    o = upd(o, lr=args.lr, weight_decay=args.wd, epochs=args.epochs,
            lr_steps=tuple(args.lr_steps) if args.lr_steps else None,
            ema_decay=args.ema_decay, accum_steps=args.accum_steps)
    r = upd(r, model_name=args.model_name,
            checkpoint_path=args.checkpoint_path, run_dir=args.run_dir)
    return Config(data=d, model=m, optim=o, loss=cfg.loss,
                  parallel=cfg.parallel, run=r).validate()

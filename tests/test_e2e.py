"""End-to-end pipeline tests on the synthetic backend: the two-stage recipe
(MTMM -> SD via checkpoint transfer) and the test protocol — SURVEY.md §7
step 4's "minimum end-to-end slice" plus checkpoint round-trips."""

import dataclasses
import os

import numpy as np
import pytest

from ehgr_tpu.configs import Config, DataConfig, ModelConfig, OptimConfig, RunConfig
from ehgr_tpu.data.factory import build_test_dataset, build_train_datasets
from ehgr_tpu.train.loop import run_training

CLS, T, HW = 5, 4, 32


def tiny_cfg(tmp, arch, **run_kw):
    run_kw.setdefault("display", 2)
    return Config(
        data=DataConfig(dataset="synthetic", backend="synthetic",
                        clip_len=T, batch_size=4, num_classes=CLS,
                        crop_size=HW, scale_size=HW, clip_num=3,
                        num_workers=2),
        model=ModelConfig(arch=arch, num_segments=T, num_classes=CLS,
                          partial_bn=False),
        optim=OptimConfig(lr=0.002, epochs=1, lr_steps=(100,),
                          ema_decay=0.9),
        run=RunConfig(run_dir=str(tmp), model_name="tiny", **run_kw),
    ).validate()


@pytest.mark.slow
class TestEndToEnd:
    def test_mtmm_then_sd_transfer(self, tmp_path):
        # Stage 1: MTMM (with the depth-artifact dumps of train_mtmm.py:267)
        cfg1 = tiny_cfg(tmp_path, "tsn_mtmm", save_depth_images=True,
                        display=2)
        ds = build_train_datasets(cfg1, "mtmm")
        res1 = run_training(cfg1, "mtmm", *ds, max_steps_per_epoch=3)
        assert np.isfinite(res1["final_train_loss"])
        best = os.path.join(res1["run_dir"], "tiny_best_ckpt")
        assert os.path.isdir(best)
        import glob

        assert glob.glob(os.path.join(res1["run_dir"], "g_depth_out_*.jpg"))
        assert glob.glob(os.path.join(res1["run_dir"], "g_depth_gt_*.jpg"))

        # Stage 2: SD init'd non-strict from the MTMM checkpoint
        cfg2 = tiny_cfg(tmp_path, "tsn_sd", checkpoint_path=best)
        ds2 = build_train_datasets(cfg2, "sd")
        res2 = run_training(cfg2, "sd", *ds2, max_steps_per_epoch=3)
        assert np.isfinite(res2["final_train_loss"])
        assert "mid1_top1" in res2

    def test_test_protocol_runs(self, tmp_path):
        from ehgr_tpu.eval.runner import run_test

        cfg = tiny_cfg(tmp_path, "tsn")
        res = run_test(cfg, arch="tsn", heads=1)
        assert res["n_videos"] == 32
        assert 0.0 <= res["final_top1"] <= 100.0
        cm = res["confusion"]["final"]
        assert cm.m.sum() == 32


class TestCheckpointRoundtrip:
    def test_state_roundtrip(self, tmp_path, rng):
        import jax
        import jax.numpy as jnp

        from ehgr_tpu.models.tsn import variant
        from ehgr_tpu.train.checkpoints import CheckpointManager
        from ehgr_tpu.train.optim import build_optimizer
        from ehgr_tpu.train.steps import create_train_state

        model = variant("tsn", num_class=CLS, num_segments=T,
                        partial_bn=False)
        x = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        tx, _ = build_optimizer(variables["params"], OptimConfig(),
                                steps_per_epoch=5)
        state = create_train_state(variables, tx)

        mgr = CheckpointManager(str(tmp_path), "rt")
        mgr.save("latest", jax.device_get(state))
        restored = mgr.restore("latest", jax.device_get(state))
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_load_for_model_relative_path(self, tmp_path, monkeypatch):
        # Regression (round-4 chip queue): dress_rehearsal passes the stage-1
        # run_dir verbatim; a RELATIVE --out made orbax restore raise
        # "Checkpoint path should be absolute" inside load_for_model.
        from ehgr_tpu.train.checkpoints import CheckpointManager, load_for_model

        src = {"params": {"a": np.ones(3, np.float32)}}
        CheckpointManager(str(tmp_path / "run"), "rt").save("best", src)
        monkeypatch.chdir(tmp_path)
        dst = {"params": {"a": np.zeros(3, np.float32),
                          "b": np.zeros(2, np.float32)}}
        merged = load_for_model(os.path.join("run", "rt_best_ckpt"), dst)
        np.testing.assert_array_equal(merged["params"]["a"], 1)

    def test_merge_variables_nonstrict(self):
        from ehgr_tpu.train.checkpoints import merge_variables

        dst = {"params": {"a": np.zeros(3), "b": np.zeros(2)}}
        src = {"params": {"a": np.ones(3), "c": np.ones(4)}}
        merged, skipped = merge_variables(dst, src)
        np.testing.assert_array_equal(merged["params"]["a"], 1)
        np.testing.assert_array_equal(merged["params"]["b"], 0)
        assert skipped == [("params", "c")]


class TestSDTestProtocol:
    def test_four_head_eval(self, tmp_path):
        """test_sd verb path: per-exit voting over multi-clip batches +
        confusion-matrix heatmap artifacts (test_sd.py behavior)."""
        from ehgr_tpu.eval.runner import run_test

        cfg = tiny_cfg(tmp_path, "tsn_sd")
        res = run_test(cfg, arch="tsn_sd", heads=4)
        for k in ("final", "mid1", "mid2", "mid3"):
            assert 0.0 <= res[f"{k}_top1"] <= 100.0
        cm = res["confusion"]["mid3"]
        assert cm.m.sum() == res["n_videos"]
        path = str(tmp_path / "cm.png")
        cm.save_heatmap(path)
        assert os.path.getsize(path) > 0


@pytest.mark.slow
class TestPseudoDepthTraining:
    def test_mtmm_rgb_depthest_from_generated_tree(self, tmp_path):
        """The full rgb_depthest path (VERDICT r1 #8): EgoGesture-layout tree
        WITHOUT Depth_Est -> generate_pseudo_depth_tree (the prepare_data
        --pseudo_depth step, ref preprocess/generate_pseudo_depth_ego.py)
        -> annotation builder -> MTMM training supervised on n_depth_est."""
        import glob as _glob
        import shutil

        from ehgr_tpu.data.annotations import construct_annot_ego
        from ehgr_tpu.data.pseudo_depth import generate_pseudo_depth_tree
        from ehgr_tpu.data.synthetic import make_synthetic_ego_tree

        paths = make_synthetic_ego_tree(str(tmp_path), size=(HW, HW),
                                        num_classes=CLS,
                                        frames_per_gesture=3 * T)
        # drop the tree's pre-baked Depth_Est and regenerate it through the
        # pseudo-depth pipeline itself
        for d in _glob.glob(os.path.join(paths["frame_path"], "*", "*",
                                         "Depth_Est")):
            shutil.rmtree(d)
        n = generate_pseudo_depth_tree(paths["frame_path"],
                                       paths["frame_path"])
        assert n > 0

        annot = tmp_path / "annot"
        annot.mkdir()
        for mode in ("train", "val"):
            construct_annot_ego(paths["frame_path"], paths["label_path"],
                                str(annot), mode)

        cfg = Config(
            data=DataConfig(dataset="EgoGesture", backend="pil",
                            annot_path=str(annot), clip_len=T, batch_size=2,
                            num_classes=CLS, crop_size=HW, scale_size=HW,
                            num_workers=1),
            model=ModelConfig(arch="tsn_mtmm", num_segments=T,
                              num_classes=CLS, partial_bn=False,
                              modal="rgb_depthest"),
            optim=OptimConfig(lr=0.002, epochs=1, lr_steps=(100,),
                              ema_decay=0.9),
            run=RunConfig(run_dir=str(tmp_path / "runs"), model_name="pd",
                          display=1),
        ).validate()
        ds = build_train_datasets(cfg, "mtmm", train_plus_val=False)
        res = run_training(cfg, "mtmm", *ds, max_steps_per_epoch=2)
        assert np.isfinite(res["final_train_loss"])


class TestFullResume:
    def test_resume_restores_step_and_momentum(self, tmp_path):
        """Crash-resume: the full TrainState round-trips through the loop
        (optimizer momentum + EMA + step counter — beyond the reference's
        weights-only --resume)."""
        import dataclasses as dc

        cfg = tiny_cfg(tmp_path, "tsn")
        ds = build_train_datasets(cfg, "baseline")
        res1 = run_training(cfg, "baseline", *ds, max_steps_per_epoch=2,
                            epochs=1)
        latest = os.path.join(res1["run_dir"], "tiny_latest_ckpt")
        assert os.path.isdir(latest)

        cfg2 = dc.replace(cfg, run=dc.replace(
            cfg.run, checkpoint_path=latest, resume_full=True),
            optim=dc.replace(cfg.optim, epochs=2))
        res2 = run_training(cfg2, "baseline", *ds, max_steps_per_epoch=2)
        # resumed at epoch 1 of 2 -> exactly one more epoch of 2 steps ran
        assert np.isfinite(res2["final_train_loss"])


class TestCrossTopologyRestore:
    """TPU-native resharding-on-restore (VERDICT r4 weak #6): a checkpoint
    written under the 8-device dp x tp mesh must restore bit-exactly on a
    single device and on a dp-only mesh.  (The reference's
    ``load_state_dict`` story, ``utils.py:24-36``, has no topology axis —
    this is the capability the TPU framework adds.)"""

    def _trained_sharded_state(self, rng):
        import jax
        import jax.numpy as jnp

        from ehgr_tpu.models.tsn import variant
        from ehgr_tpu.parallel.mesh import (make_mesh, param_shardings,
                                            shard_batch)
        from ehgr_tpu.train.optim import build_optimizer
        from ehgr_tpu.train.steps import (create_train_state,
                                          make_train_step)

        cls = 6  # even: the tp head shards class dim over model axis = 2
        model = variant("tsn", num_class=cls, num_segments=T,
                        partial_bn=False)
        x = jnp.zeros((2, T, HW, HW, 3), jnp.float32)
        variables = jax.jit(
            lambda r, xx: model.init(r, xx, train=False)
        )({"params": jax.random.key(0)}, x)
        tx, _ = build_optimizer(variables["params"], OptimConfig(),
                                steps_per_epoch=5)
        state = create_train_state(variables, tx)

        mesh = make_mesh(8, model_parallel=2)
        psh = param_shardings(state.params, mesh, model_parallel=True)
        # momentum/EMA follow the param layout; scalars/stats replicate
        from ehgr_tpu.parallel.mesh import replicated
        repl = replicated(mesh)
        state = state.replace(
            params=jax.tree.map(jax.device_put, state.params, psh),
            ema_params=jax.tree.map(jax.device_put, state.ema_params, psh),
            batch_stats=jax.tree.map(
                lambda v: jax.device_put(v, repl), state.batch_stats),
            ema_batch_stats=jax.tree.map(
                lambda v: jax.device_put(v, repl), state.ema_batch_stats),
            opt_state=jax.tree.map(
                lambda v: jax.device_put(v, repl), state.opt_state),
            step=jax.device_put(state.step, repl))

        from ehgr_tpu.configs import LossConfig

        step_fn = make_train_step(model, tx, stage="baseline",
                                  loss_cfg=LossConfig(), ema_decay=0.9,
                                  mean=(0.45, 0.45, 0.45),
                                  std=(0.22, 0.22, 0.22), donate=False)
        batch = shard_batch(
            {"rgb": rng.integers(0, 255, (8, T, HW, HW, 3), np.uint8),
             "label": rng.integers(0, cls, 8, np.int64)}, mesh)
        state, _ = step_fn(state, batch, jax.random.key(1))
        return model, state

    def test_dp_tp_save_restores_on_one_device_and_dp_only(
            self, tmp_path, rng):
        import jax
        import jax.numpy as jnp
        import orbax.checkpoint as ocp

        from ehgr_tpu.parallel.mesh import make_mesh, replicated

        model, state = self._trained_sharded_state(rng)
        path = str(tmp_path / "topo_ckpt")
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, state)  # sharded arrays, saved as laid out
            ckptr.wait_until_finished()

            def restore_as(sharding):
                tgt = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                                   sharding=sharding),
                    jax.device_get(state))
                return ckptr.restore(path, tgt)

            one = restore_as(
                jax.sharding.SingleDeviceSharding(jax.devices()[0]))
            dp = restore_as(replicated(make_mesh(8, model_parallel=1)))

        ref = jax.device_get(state)
        for restored in (one, dp):
            got = jax.device_get(restored)
            assert int(got.step) == int(ref.step) == 1
            for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # the restored state is USABLE: eval logits identical across
        # topologies (not just stored bytes)
        x = jnp.asarray(rng.normal(size=(2, T, HW, HW, 3)), jnp.float32)
        out_ref = model.apply({"params": ref.params,
                               "batch_stats": ref.batch_stats},
                              x, train=False)
        for restored in (one, dp):
            out = model.apply({"params": restored.params,
                               "batch_stats": restored.batch_stats},
                              x, train=False)
            np.testing.assert_allclose(np.asarray(out),
                                       np.asarray(out_ref),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.slow
class TestSecondaryBackboneRecipes:
    """Full stage wiring (policy groups, consensus, loaders, checkpointing,
    test protocol) for the non-ResNet backbones (VERDICT r4 weak — module
    parity existed, recipe wiring was unproven; ref ``models/models.py:
    169-212`` backbone dispatch)."""

    @pytest.mark.parametrize("base_model",
                             ["mobilenet_v2", "bn_inception", "res2net50"])
    def test_train_cli_then_test_protocol(self, tmp_path, base_model):
        from cli.train import main as train_main
        from ehgr_tpu.configs import config_from_args
        from ehgr_tpu.eval.runner import run_test

        argv = ["--synthetic", "--epochs", "1", "--batch_size", "2",
                "--clip_len", "4", "--crop_size", "32", "--scale_size", "32",
                "--num_classes", "5", "--synthetic_videos", "4",
                "--clip_num", "2", "--lr", "0.01",
                "--base_model", base_model, "--is_shift",
                "--run_dir", str(tmp_path), "--model_name", "bk"]
        res = train_main(argv)
        assert np.isfinite(res["final_train_loss"])
        best = os.path.join(res["run_dir"], "bk_best_ckpt")
        assert os.path.isdir(best)

        cfg = config_from_args(argv + ["--checkpoint_path", best])
        out = run_test(cfg, arch="tsn", heads=1)
        assert 0.0 <= out["final_top1"] <= 100.0


@pytest.mark.slow
class TestNvGestureRealDataPath:
    """The NvGesture real-data runbook, end to end on a reference-layout
    fixture tree (VERDICT r4 next #8): .lst parsing -> annotation pickles ->
    MTMM -> SD transfer -> 3-crop multi-clip test protocol
    (``sh/test_nv.sh:2-8`` geometry)."""

    def test_lst_tree_two_stage_and_3crop_test(self, tmp_path):
        from cli.prepare_data import main as prep_main
        from ehgr_tpu.data.synthetic import make_synthetic_nv_tree
        from ehgr_tpu.eval.runner import run_test

        root = make_synthetic_nv_tree(
            str(tmp_path / "nv"), n_videos=6, frames_per_video=3 * T,
            size=(40, 48), num_classes=3)
        annot = str(tmp_path / "annot")
        prep_main(["nv", "--dataset_path", root, "--save_path", annot])

        def cfg(arch, **run_kw):
            return Config(
                data=DataConfig(dataset="NvGesture", backend="pil",
                                annot_path=annot, clip_len=T, batch_size=2,
                                num_classes=3, crop_size=HW, scale_size=40,
                                train_crop_size=HW, test_crops=3,
                                clip_num=2, num_workers=1),
                model=ModelConfig(arch=arch, num_segments=T, num_classes=3,
                                  partial_bn=False, modal="rgb_depth"),
                optim=OptimConfig(lr=0.002, epochs=1, lr_steps=(100,),
                                  ema_decay=0.9),
                run=RunConfig(run_dir=str(tmp_path / "runs"),
                              model_name="nv", display=1, **run_kw),
            ).validate()

        c1 = cfg("tsn_mtmm")
        ds = build_train_datasets(c1, "mtmm")  # train + val=test split
        res1 = run_training(c1, "mtmm", *ds, max_steps_per_epoch=2)
        assert np.isfinite(res1["final_train_loss"])
        best = os.path.join(res1["run_dir"], "nv_best_ckpt")
        assert os.path.isdir(best)

        c2 = cfg("tsn_sd", checkpoint_path=best)
        res2 = run_training(c2, "sd", *build_train_datasets(c2, "sd"),
                            max_steps_per_epoch=2)
        assert np.isfinite(res2["final_train_loss"])
        best2 = os.path.join(res2["run_dir"], "nv_best_ckpt")

        # 3-crop multi-clip protocol on the SD weights, 4 heads
        c3 = cfg("tsn_sd", checkpoint_path=best2)
        out = run_test(c3, arch="tsn_sd", heads=4)
        assert out["n_videos"] == 6
        for k in ("final", "mid1", "mid2", "mid3"):
            assert 0.0 <= out[f"{k}_top1"] <= 100.0
        assert out["confusion"]["final"].m.sum() == 6

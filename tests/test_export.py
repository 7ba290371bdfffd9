"""AOT serving-export tests (ehgr_tpu.serve): roundtrip an exported scoring
program through the on-disk artifact and pin its outputs against the live
jitted function — no model code on the load side."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ehgr_tpu.models.tsn import variant
from ehgr_tpu.serve import (export_artifact, load_artifact, make_clip_scorer,
                            make_video_scorer, save_artifact, symbolic_batch)

T, HW, CLS = 4, 32, 7
MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def _model(arch="tsn"):
    model = variant(arch, num_class=CLS, num_segments=T, temporal="action",
                    partial_bn=False)
    x = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    return model, variables


class TestServingExport:
    def test_clip_scorer_roundtrip(self, rng, tmp_path):
        model, variables = _model()
        fn = make_clip_scorer(model, variables, mean=MEAN, std=STD,
                              dtype_name="float32")
        clips = jnp.asarray(rng.integers(0, 256, (3, T, HW, HW, 3)),
                            jnp.uint8)
        want = np.asarray(fn(clips))

        exported = export_artifact(fn, clips.shape)
        path = str(tmp_path / "m.ehgrx")
        nbytes = save_artifact(path, exported, {"arch": "tsn"})
        assert nbytes > 1000

        loaded, manifest = load_artifact(path)
        got = np.asarray(loaded(clips))
        np.testing.assert_array_equal(want, got)
        assert manifest["arch"] == "tsn"
        assert manifest["jax_version"] == jax.__version__

    def test_video_scorer_protocol_shape(self, rng, tmp_path):
        model, variables = _model("tsn_sd")          # multi-output variant
        fn = make_video_scorer(model, variables, scale_size=HW, crop_size=HW,
                               dtype_name="float32")
        frames = jnp.asarray(rng.integers(0, 256, (2, 3, T, HW, HW, 3)),
                             jnp.uint8)
        want = np.asarray(fn(frames))
        assert want.shape == (2, CLS)
        np.testing.assert_allclose(want.sum(-1), 1.0, rtol=1e-5)

        exported = export_artifact(fn, frames.shape)
        path = str(tmp_path / "v.ehgrx")
        save_artifact(path, exported, {"arch": "tsn_sd"})
        loaded, _ = load_artifact(path)
        np.testing.assert_array_equal(want, np.asarray(loaded(frames)))

    def test_symbolic_batch_serves_any_size(self, rng, tmp_path):
        model, variables = _model("tsn_middle2")     # deploy truncation
        fn = make_clip_scorer(model, variables, mean=MEAN, std=STD,
                              dtype_name="float32")
        shape = symbolic_batch((8, T, HW, HW, 3))
        exported = export_artifact(fn, shape)
        path = str(tmp_path / "s.ehgrx")
        save_artifact(path, exported, {"arch": "tsn_middle2"})
        loaded, manifest = load_artifact(path)
        assert manifest["in_shape"][0] == "v"

        for n in (1, 5):
            clips = jnp.asarray(rng.integers(0, 256, (n, T, HW, HW, 3)),
                                jnp.uint8)
            got = np.asarray(loaded(clips))
            np.testing.assert_array_equal(got, np.asarray(fn(clips)))

    @pytest.mark.tpu
    @pytest.mark.skipif(os.environ.get("EHGR_TPU_TESTS") != "1",
                        reason="needs the real chip; set EHGR_TPU_TESTS=1")
    def test_tpu_artifact_runs_on_chip(self, tmp_path):
        """Export-for-TPU -> reload -> execute on the real chip (VERDICT r3
        next #4).  Runs in a subprocess so conftest's cpu-platform override
        doesn't apply; the parent suite stays on the CPU mesh."""
        import subprocess
        import sys
        import textwrap

        script = textwrap.dedent("""
            import torch  # noqa: F401  (torch before jax; CLAUDE.md)
            import numpy as np
            import jax, jax.numpy as jnp
            from ehgr_tpu.models.tsn import variant
            from ehgr_tpu.serve import (export_artifact, load_artifact,
                                        make_clip_scorer, save_artifact)
            assert jax.devices()[0].platform == "tpu", jax.devices()
            T, HW, CLS = 4, 32, 7
            model = variant("tsn", num_class=CLS, num_segments=T,
                            temporal="action", partial_bn=False)
            x = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
            variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
                {"params": jax.random.key(0)}, x)
            fn = make_clip_scorer(model, variables,
                                  mean=(0.485, 0.456, 0.406),
                                  std=(0.229, 0.224, 0.225),
                                  dtype_name="float32")
            exported = export_artifact(fn, (3, T, HW, HW, 3),
                                       platforms=("tpu",))
            path = %r
            save_artifact(path, exported, {"arch": "tsn"})
            loaded, manifest = load_artifact(path)
            assert manifest["platforms"] == ["tpu"], manifest
            clips = jnp.asarray(np.random.default_rng(0).integers(
                0, 256, (3, T, HW, HW, 3)), jnp.uint8)
            got = np.asarray(loaded(clips))
            want = np.asarray(fn(clips))
            np.testing.assert_allclose(got, want, atol=1e-5)
            print("TPU_ARTIFACT_OK", float(np.max(np.abs(got - want))))
        """) % str(tmp_path / "tpu.ehgrx")
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
        res = subprocess.run([sys.executable, "-c", script], env=env,
                             capture_output=True, text=True, timeout=600)
        assert res.returncode == 0, res.stderr[-2000:]
        assert "TPU_ARTIFACT_OK" in res.stdout, res.stdout

    def test_bad_magic_raises(self, tmp_path):
        path = str(tmp_path / "junk.ehgrx")
        with open(path, "wb") as f:
            f.write(b"NOTMAGIC" * 4)
        with pytest.raises(ValueError, match="not an EHGRX1"):
            load_artifact(path)

    def test_cli_export(self, tmp_path):
        from cli.export_serving import main

        path = str(tmp_path / "cli.ehgrx")
        res = main(["--out", path, "--arch", "tsn", "--videos", "2",
                    "--clip_num", "2", "--preset", "ego_baseline",
                    "--dataset", "synthetic", "--clip_len", "4",
                    "--crop_size", "32", "--scale_size", "32",
                    "--num_classes", "7"])
        assert res["bytes"] > 1000
        loaded, manifest = load_artifact(path)
        assert manifest["num_segments"] == 4

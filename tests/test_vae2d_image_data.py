"""2D SD-VAE, image-folder pipeline, and DiT feature extraction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mhla_tpu.models.vae2d import (
    VAE2D,
    VAE2DConfig,
    convert_sd_vae_checkpoint,
)

TINY = VAE2DConfig(block_out_channels=(32, 64), layers_per_block=2)


def _make_images(root, n_classes=2, per_class=3, size=40):
    from PIL import Image

    rng = np.random.default_rng(0)
    for c in range(n_classes):
        d = root / f"class_{c}"
        d.mkdir(parents=True)
        for i in range(per_class):
            arr = rng.integers(0, 255, (size, size + 8, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.png")
    return root


class TestVAE2D:
    @pytest.mark.slow
    def test_encode_decode_shapes(self, key):
        vae = VAE2D(TINY)
        x = jax.random.normal(key, (1, 32, 32, 3)) * 0.5
        params = vae.init(key, x)
        z = vae.apply(params, x, method=VAE2D.encode)
        assert z.shape == (1, 16, 16, 4)  # f2 for the 2-block tiny config
        y = vae.apply(params, z, method=VAE2D.decode)
        assert y.shape == (1, 32, 32, 3)
        assert np.isfinite(np.asarray(y)).all()

    def test_encode_sampling_uses_rng(self, key):
        vae = VAE2D(TINY)
        x = jax.random.normal(key, (1, 32, 32, 3)) * 0.5
        params = vae.init(key, x)
        z_mean = vae.apply(params, x, method=VAE2D.encode)
        z_s1 = vae.apply(params, x, jax.random.PRNGKey(1), method=VAE2D.encode)
        z_s2 = vae.apply(params, x, jax.random.PRNGKey(2), method=VAE2D.encode)
        assert not np.allclose(np.asarray(z_s1), np.asarray(z_s2))
        assert not np.allclose(np.asarray(z_mean), np.asarray(z_s1))

    def test_converter_structure_matches_init(self):
        """Invert the converter's layout mapping from the flax params and
        feed it back through: names, shapes, and values must round-trip.
        Validates the diffusers AutoencoderKL name map at full SD size
        without compute (eval_shape init)."""
        cfg = VAE2DConfig()  # full SD-VAE
        vae = VAE2D(cfg)
        x = jnp.zeros((1, 64, 64, 3))
        shapes = jax.eval_shape(vae.init, jax.random.PRNGKey(0), x)
        rng = np.random.default_rng(0)
        params = jax.tree.map(
            lambda s: rng.standard_normal(s.shape).astype(np.float32), shapes
        )

        sd = {}

        def emit(prefix, tree):
            for name, sub in tree.items():
                tname = _to_torch_name(prefix, name)
                if "kernel" in sub:  # conv or dense
                    w = np.asarray(sub["kernel"])
                    if w.ndim == 4:  # flax conv [kh,kw,in,out] -> torch
                        w = w.transpose(3, 2, 0, 1)
                    else:
                        w = w.T
                    sd[f"{tname}.weight"] = w
                    sd[f"{tname}.bias"] = np.asarray(sub["bias"])
                elif "scale" in sub:  # groupnorm
                    sd[f"{tname}.weight"] = np.asarray(sub["scale"])
                    sd[f"{tname}.bias"] = np.asarray(sub["bias"])
                else:  # nested block
                    emit(tname, sub)

        def _to_torch_name(prefix, name):
            import re

            m = re.fullmatch(r"down_(\d+)_res_(\d+)", name)
            if m:
                return f"{prefix}.down_blocks.{m[1]}.resnets.{m[2]}"
            m = re.fullmatch(r"down_(\d+)_downsample", name)
            if m:
                return f"{prefix}.down_blocks.{m[1]}.downsamplers.0"
            m = re.fullmatch(r"up_(\d+)_res_(\d+)", name)
            if m:
                return f"{prefix}.up_blocks.{m[1]}.resnets.{m[2]}"
            m = re.fullmatch(r"up_(\d+)_upsample", name)
            if m:
                return f"{prefix}.up_blocks.{m[1]}.upsamplers.0"
            m = re.fullmatch(r"mid_res_(\d+)", name)
            if m:
                return f"{prefix}.mid_block.resnets.{m[1]}"
            if name == "mid_attn":
                return f"{prefix}.mid_block.attentions.0"
            if name == "to_out":
                return f"{prefix}.to_out.0"
            return f"{prefix}.{name}" if prefix else name

        emit("", params["params"])
        got = convert_sd_vae_checkpoint(sd, cfg)

        ref_paths = {jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_flatten_with_path(params)[0]}
        got_paths = {jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_flatten_with_path(got)[0]}
        assert ref_paths == got_paths
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(got)[0],
        ):
            assert np.asarray(a).shape == np.asarray(b).shape, (pa, a.shape, b.shape)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), err_msg=str(pa))


class TestImageFolder:
    def test_batches_and_aug(self, tmp_path):
        from mhla_tpu.data.image_data import ImageAugConfig, ImageFolderDataset

        root = _make_images(tmp_path / "imgs")
        ds = ImageFolderDataset(str(root), ImageAugConfig(img_size=24, train=True))
        assert ds.num_classes == 2
        x, y = next(iter(ds.batches(4)))
        assert x.shape == (4, 24, 24, 3) and x.dtype == np.float32
        assert set(np.unique(y)) <= {0, 1}
        # eval transform is deterministic
        ds_eval = ImageFolderDataset(
            str(root), ImageAugConfig(img_size=24, train=False)
        )
        x1, _ = next(iter(ds_eval.batches(4)))
        x2, _ = next(iter(ds_eval.batches(4)))
        np.testing.assert_allclose(x1, x2)

    def test_center_crop_arr(self, tmp_path):
        from PIL import Image

        from mhla_tpu.data.image_data import center_crop_arr

        img = Image.fromarray(
            np.zeros((100, 173, 3), np.uint8)
        )
        out = center_crop_arr(img, 32)
        assert out.shape == (32, 32, 3)

    def test_random_erasing(self):
        from mhla_tpu.data.image_data import random_erasing

        arr = np.zeros((16, 16, 3), np.float32)
        out = random_erasing(arr, np.random.default_rng(0), prob=1.0)
        assert (out != 0).any() and arr.sum() == 0  # erased region, copy


class TestFeatureExtraction:
    @pytest.mark.slow
    def test_extract_then_train_dit(self, tmp_path):
        """End-to-end BASELINE scenario 3 plumbing: images -> VAE latents
        (.npy pairs, reference layout) -> dit_train consumes them."""
        from mhla_tpu.data.extract_features import main as extract
        from mhla_tpu.data.image_data import LatentDataset
        from mhla_tpu.train.dit_train import main as dit_main

        root = _make_images(tmp_path / "imgs", per_class=4, size=40)
        out = tmp_path / "features"
        n = extract([
            f"--image_dir={root}", f"--out_dir={out}",
            "--image_size=32", "--batch_size=4",
        ])
        assert n == 8
        feats = np.load(out / "imagenet256_features" / "0.npy")
        assert feats.shape == (2, 4, 4, 4)  # [flip, C, 32/8, 32/8]

        ds = LatentDataset(str(out))
        x, y = next(ds.infinite(4))
        assert x.shape == (4, 4, 4, 4)

        res = dit_main([
            f"--work_dir={tmp_path}/dit",
            "--model_name=DiT-S/2",
            "--depth=2", "--hidden_size=64", "--num_heads=2",
            "--input_size=4", "--block_size=2", "--num_classes=2",
            f"--feature_dir={out}",
            "--bf16=false",
            "--train.max_steps=2", "--train.batch_size=4",
            "--train.log_interval=1", "--train.save_interval=100",
            "--optimizer.total_steps=2",
        ])
        assert np.isfinite(res["final_loss"])

    @pytest.mark.slow
    def test_vit_train_on_image_folder(self, tmp_path):
        from mhla_tpu.train.vit_train import main as vit_main

        root = _make_images(tmp_path / "imgs", per_class=6, size=40)
        res = vit_main([
            f"--work_dir={tmp_path}/vit",
            "--model_name=deit_tiny_mhla",
            "--img_size=32", "--piece_size=2", "--num_classes=2",
            f"--data_dir={root}",
            "--bf16=false",
            "--train.max_steps=2", "--train.batch_size=4",
            "--train.log_interval=1", "--train.save_interval=100",
            "--optimizer.total_steps=2", "--optimizer.warmup_steps=1",
        ])
        assert np.isfinite(res["final_loss"])

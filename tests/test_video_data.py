"""Video dataset / sampler / distillation tests."""

import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.data.video_data import (
    ASPECT_RATIO_VIDEO_480,
    AspectRatioBatchSampler,
    ZipVideoDataset,
    nearest_bucket,
    write_latent_cache,
)


def make_shard(path, keys):
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for k in keys:
            import io

            buf = io.BytesIO()
            np.savez(buf, latent=np.full((2, 4, 4, 3), ord(k[0]), np.float32))
            z.writestr(f"{k}.npz", buf.getvalue())
            z.writestr(f"{k}.json", json.dumps({"caption": f"video {k}", "h": 480, "w": 832}))


class TestZipVideoDataset:
    def test_index_and_read(self, tmp_path):
        p1, p2 = str(tmp_path / "s1.zip"), str(tmp_path / "s2.zip")
        make_shard(p1, ["a", "b"])
        make_shard(p2, ["c"])
        ds = ZipVideoDataset([p1, p2])
        assert len(ds) == 3
        assert ds.samples[0].meta["caption"].startswith("video")
        item = ds[0]
        assert "latent" in item and item["latent"].shape == (2, 4, 4, 3)
        ds.close()


class TestAspectSampler:
    def test_batches_single_bucket(self):
        buckets = ["0.57"] * 10 + ["1.00"] * 7
        s = AspectRatioBatchSampler(buckets, batch_size=4)
        for batch in s.epoch(0):
            kinds = {buckets[i] for i in batch}
            assert len(kinds) == 1 and len(batch) == 4

    def test_rank_sharding_disjoint(self):
        buckets = ["0.57"] * 32
        all_batches = []
        for r in range(4):
            s = AspectRatioBatchSampler(buckets, 4, rank=r, world_size=4)
            all_batches += [tuple(b) for b in s.epoch(0)]
        flat = [i for b in all_batches for i in b]
        assert len(set(flat)) == len(flat)

    def test_nearest_bucket(self):
        assert nearest_bucket(480, 832) == "0.57"
        assert nearest_bucket(480, 480) == "1.00"


class TestLatentCache:
    def test_write_read(self, tmp_path):
        path = write_latent_cache(
            str(tmp_path), "clip0",
            np.zeros((4, 8, 8, 4), np.float32),
            np.zeros((8, 32), np.float32),
            {"caption": "x"},
        )
        blob = np.load(path)
        assert blob["latent"].shape == (4, 8, 8, 4)


@pytest.mark.slow
class TestDistill:
    def test_wan_train_distill_smoke(self, tmp_path):
        """Train 1 step, checkpoint, then 1 distillation step against it."""
        from mhla_tpu.train.wan_train import main

        common = [
            "--model.model=Wan_T2V_1300M",
            "--model.dim=48", "--model.ffn_dim=96", "--model.num_heads=4",
            "--model.num_layers=2", "--model.linear_attn_idx=(0,)",
            "--model.block_layout=(2,2,2)", "--bf16=false",
            "--data.latent_frames=4", "--data.latent_height=8",
            "--data.latent_width=8", "--data.latent_dim=4",
            "--data.text_len=8", "--data.text_dim=32",
            "--train.max_steps=1", "--train.log_interval=1",
            "--train.save_interval=100", "--optimizer.total_steps=1",
            "--optimizer.warmup_steps=1",
        ]
        out = main([f"--work_dir={tmp_path}/teacher"] + common)
        assert np.isfinite(out["final_loss"])
        # distill against the teacher's param sub-tree checkpoint
        import orbax.checkpoint as ocp
        from pathlib import Path

        from mhla_tpu.utils.checkpoint import resolve_resume_path

        # teacher ckpt holds a TrainState; re-save just params for the loader
        from mhla_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
        from mhla_tpu.train.wan_train import WanTrainConfig, build_model
        from mhla_tpu.utils.config import parse_cli
        import jax.numpy as jnp

        cfg = parse_cli(WanTrainConfig, [f"--work_dir={tmp_path}/teacher"] + common)
        model, mc = build_model(cfg)
        z0 = jnp.zeros((1, 4, 8, 8, 4))
        c0 = jnp.zeros((1, 8, 32))
        params = model.init(jax.random.PRNGKey(0), z0, jnp.zeros((1,)), c0)
        save_checkpoint(f"{tmp_path}/teacher_params", 1, params)
        tp = resolve_resume_path(f"{tmp_path}/teacher_params", "latest")

        out2 = main(
            [f"--work_dir={tmp_path}/student", "--distill.enable=true",
             f"--distill.teacher_ckpt={tp}"] + common
        )
        assert np.isfinite(out2["final_loss"])


@pytest.mark.slow
class TestLoRATrain:
    def test_wan_lora_smoke(self, tmp_path):
        from mhla_tpu.train.wan_train import main

        out = main([
            f"--work_dir={tmp_path}/wan_lora",
            "--model.dim=48", "--model.ffn_dim=96", "--model.num_heads=4",
            "--model.num_layers=2", "--model.linear_attn_idx=(0,)",
            "--model.block_layout=(2,2,2)", "--bf16=false",
            "--data.latent_frames=4", "--data.latent_height=8",
            "--data.latent_width=8", "--data.latent_dim=4",
            "--data.text_len=8", "--data.text_dim=32",
            "--train.max_steps=2", "--train.log_interval=1",
            "--train.save_interval=100", "--optimizer.total_steps=2",
            "--optimizer.warmup_steps=1",
            "--lora.enable=true", "--lora.rank=4",
        ])
        assert np.isfinite(out["final_loss"])

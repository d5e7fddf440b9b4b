"""DiT latent-diffusion training + sampling (mhla_dit harness analogue).

Covers the reference's DiT pipeline (``mhla_dit/train.py:126-398``,
``sample.py:21-83``): train a class-conditional DiT on pre-extracted VAE
latents (``.npy`` pairs from ``extract_features.py``; synthetic latents when
absent) with EMA, AdamW, mixing-matrix clamps after each step, and sample
with CFG via the respaced ancestral loop.

Usage:
    python -m mhla_tpu.train.dit_train --train.max_steps=100 --model_name=DiT-S/2
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import create_diffusion
from ..models.dit import DiT, DiTConfig, build_dit
from ..parallel import batch_sharding, make_mesh
from ..utils.checkpoint import resolve_resume_path, save_checkpoint, load_checkpoint, checkpoint_step
from ..utils.config import dump_config, parse_cli
from ..utils.logging import LogBuffer, Throughput, get_root_logger
from .trainer import (
    OptimizerConfig,
    init_train_state_sharded,
    make_optimizer,
    make_train_step,
)


@dataclasses.dataclass
class DiTTrainLoop:
    max_steps: int = 100
    batch_size: int = 16
    log_interval: int = 10
    save_interval: int = 1000
    ema_decay: float = 0.9999
    seed: int = 0
    resume_from: Optional[str] = "latest"
    # torch .pt/.pth of a standard DiT to finetune from (qkv->to_qkv remap,
    # MHLA params fresh; reference mhla_dit/train.py:206-231)
    finetune_from: Optional[str] = None


@dataclasses.dataclass
class DiTTrainConfig:
    model_name: str = "DiT-S/2"
    input_size: int = 32  # 256px images -> 32x32x4 SD-VAE latents
    block_size: int = 16
    num_classes: int = 1000
    # size overrides (None -> preset from model_name); for debug/smoke runs
    depth: Optional[int] = None
    hidden_size: Optional[int] = None
    num_heads: Optional[int] = None
    feature_dir: Optional[str] = None  # extracted latents (.npy); None -> synthetic
    optimizer: OptimizerConfig = dataclasses.field(
        default_factory=lambda: OptimizerConfig(
            learning_rate=1e-4, weight_decay=0.0, grad_clip=None, schedule="constant",
            warmup_steps=0, total_steps=400_000,
        )
    )
    train: DiTTrainLoop = dataclasses.field(default_factory=DiTTrainLoop)
    work_dir: str = "work_dirs/dit"
    bf16: bool = True


def latent_batches(
    cfg: DiTTrainConfig, rng: np.random.Generator
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (latents NHWC, labels). Reads extract_features-style .npy pairs
    (``mhla_dit/train.py:102-121``) or synthesizes latents."""
    if cfg.feature_dir and Path(cfg.feature_dir).exists():
        # extract_features.py layout (imagenet256_features/labels .npy pairs
        # with flip variants, reference mhla_dit/train.py:102-121) or flat
        # .npz latent shards
        from ..data.image_data import LatentDataset

        yield from LatentDataset(cfg.feature_dir, seed=cfg.train.seed).infinite(
            cfg.train.batch_size
        )
    else:
        while True:
            x = rng.standard_normal(
                (cfg.train.batch_size, cfg.input_size, cfg.input_size, 4),
                dtype=np.float32,
            )
            y = rng.integers(0, cfg.num_classes, cfg.train.batch_size)
            yield x, y.astype(np.int32)


def main(argv=None) -> dict:
    cfg = parse_cli(DiTTrainConfig, argv if argv is not None else sys.argv[1:])
    logger = get_root_logger(f"{cfg.work_dir}/train.log")
    dump_config(cfg, f"{cfg.work_dir}/config.yaml")

    size_overrides = {
        k: getattr(cfg, k)
        for k in ("depth", "hidden_size", "num_heads")
        if getattr(cfg, k) is not None
    }
    model, model_cfg = build_dit(
        cfg.model_name,
        input_size=cfg.input_size,
        block_size=cfg.block_size,
        num_classes=cfg.num_classes,
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
        **size_overrides,
    )
    diffusion, _ = create_diffusion(None, learn_sigma=model_cfg.learn_sigma)

    rng = jax.random.PRNGKey(cfg.train.seed)
    x0 = jnp.zeros((cfg.train.batch_size, cfg.input_size, cfg.input_size, 4))
    y0 = jnp.zeros((cfg.train.batch_size,), jnp.int32)
    params = model.init(
        {"params": rng, "label_dropout": rng}, x0, y0.astype(jnp.float32), y0
    )
    n_params = sum(p.size for p in jax.tree.leaves(params))
    logger.info(f"{cfg.model_name}: {n_params/1e6:.1f}M params")

    if cfg.train.finetune_from:
        import torch

        from ..models.convert_dit import convert_dit_checkpoint

        blob = torch.load(
            cfg.train.finetune_from, map_location="cpu", weights_only=True
        )
        blob = blob.get("ema", blob.get("model", blob))  # DiT ckpt dicts
        state_np = {k: v.float().numpy() for k, v in blob.items()}
        params = jax.tree.map(
            jnp.asarray, convert_dit_checkpoint(state_np, model_cfg, params)
        )
        logger.info(f"finetuning from {cfg.train.finetune_from}")

    tx = make_optimizer(cfg.optimizer)
    mesh = make_mesh()

    def loss_fn(p, batch, step_rng):
        x, y = batch
        t_rng, n_rng, d_rng = jax.random.split(step_rng, 3)
        t = jax.random.randint(t_rng, (x.shape[0],), 0, diffusion.num_timesteps)

        def model_fn(x_t, tt, **kw):
            return model.apply(
                p, x_t.astype(x.dtype), tt, y, train=True,
                rngs={"label_dropout": d_rng},
            )

        losses = diffusion.training_losses(model_fn, x, t, n_rng)
        return losses["loss"].mean(), {"mse": losses["mse"].mean()}

    with mesh:
        state = init_train_state_sharded(params, tx, mesh, ema=True)
        step_fn = make_train_step(loss_fn, tx, ema_decay=cfg.train.ema_decay)

        start = 0
        if cfg.train.resume_from:
            path = resolve_resume_path(cfg.work_dir, cfg.train.resume_from)
            if path:
                state = load_checkpoint(path, state)
                start = checkpoint_step(path)
                logger.info(f"resumed from {path}")

        data = latent_batches(cfg, np.random.default_rng(cfg.train.seed))
        buf, thr = LogBuffer(), Throughput(cfg.train.max_steps)
        last = float("nan")
        for i in range(start, cfg.train.max_steps):
            x, y = next(data)
            batch = (
                jax.device_put(jnp.asarray(x), batch_sharding(mesh, cfg.train.batch_size)),
                jax.device_put(jnp.asarray(y), batch_sharding(mesh, cfg.train.batch_size)),
            )
            state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
            last = float(metrics["loss"])
            buf.update(loss=last)
            if (i + 1) % cfg.train.log_interval == 0:
                speed = thr.step(i + 1, cfg.train.batch_size)
                logger.info(
                    f"step {i+1}/{cfg.train.max_steps} "
                    f"loss {buf.average()['loss']:.4f} "
                    f"{speed['items_per_sec']:.1f} img/s"
                )
            if (i + 1) % cfg.train.save_interval == 0:
                save_checkpoint(cfg.work_dir, i + 1, state)
        save_checkpoint(cfg.work_dir, cfg.train.max_steps, state)
    return {"final_loss": last, "params": n_params}


def sample(
    model: DiT,
    variables,
    labels: jax.Array,
    cfg_scale: float = 4.0,
    num_steps: str = "250",
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """CFG sampling (reference ``sample.py``): doubled batch with null labels
    in the second half, respaced ancestral loop, guided eps."""
    cfg = model.cfg
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    diffusion, t_map = create_diffusion(num_steps, learn_sigma=cfg.learn_sigma)
    n = labels.shape[0]
    y = jnp.concatenate([labels, jnp.full_like(labels, cfg.num_classes)])

    def model_fn(x, t, **kw):
        return model.forward_with_cfg(variables, x, t, y, cfg_scale)

    shape = (2 * n, cfg.input_size, cfg.input_size, cfg.in_channels)
    out = diffusion.p_sample_loop(model_fn, shape, rng, timestep_map=t_map)
    return out[:n]


if __name__ == "__main__":
    main()

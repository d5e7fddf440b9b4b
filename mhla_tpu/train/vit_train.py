"""ViT ImageNet-style classification training (timm_train.py analogue).

Compact TPU re-design of the reference's timm fork
(``mhla_image_classification/timm_train.py``: mixup/cutmix, label smoothing,
EMA 0.9996, cosine LR, grad clip, DDP): the same recipe expressed as a pjit
train step over the (data, fsdp) mesh. Data comes from an image-folder tree
(numpy/PIL) or a synthetic stream when no dataset is mounted.

Usage:
    python -m mhla_tpu.train.vit_train --model_name=deit_small_mhla ...
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vit import build_vit
from ..parallel import batch_sharding, make_mesh
from ..utils.checkpoint import (
    checkpoint_step,
    load_checkpoint,
    resolve_resume_path,
    save_checkpoint,
)
from ..utils.config import dump_config, parse_cli
from ..utils.logging import LogBuffer, Throughput, get_root_logger
from .trainer import (
    OptimizerConfig,
    init_train_state_sharded,
    make_optimizer,
    make_train_step,
)


@dataclasses.dataclass
class ViTTrainLoop:
    max_steps: int = 100
    batch_size: int = 64
    log_interval: int = 10
    save_interval: int = 5000
    ema_decay: float = 0.9996  # reference model-ema-decay
    label_smoothing: float = 0.1
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    mixup_prob: float = 1.0
    seed: int = 0
    resume_from: Optional[str] = "latest"
    # in-training validation (reference: a held-out pass each epoch, params
    # AND EMA params — timm_train.py:1261): every eval_interval steps run
    # eval_batches held-out batches and log top-1 for both weight sets.
    eval_interval: int = 0  # 0 = off
    eval_batches: int = 8


@dataclasses.dataclass
class ViTTrainConfig:
    model_name: str = "deit_small_mhla"
    img_size: int = 256
    piece_size: int = 4
    transform: str = "linear"
    exp_sigma: float = 1.0  # reference train_mhla.sh setting
    num_classes: int = 1000
    data_dir: Optional[str] = None  # image-folder root; None -> synthetic
    val_dir: Optional[str] = None  # held-out image folder; None -> synthetic
    optimizer: OptimizerConfig = dataclasses.field(
        default_factory=lambda: OptimizerConfig(
            learning_rate=1e-3, weight_decay=0.05, grad_clip=5.0,
            warmup_steps=10_000, total_steps=500_000,
        )
    )
    train: ViTTrainLoop = dataclasses.field(default_factory=ViTTrainLoop)
    work_dir: str = "work_dirs/vit"
    bf16: bool = True


def mixup_cutmix(
    rng: jax.Array,
    images: jax.Array,
    labels_onehot: jax.Array,
    mixup_alpha: float,
    cutmix_alpha: float,
) -> Tuple[jax.Array, jax.Array]:
    """Batch-level mixup/cutmix with soft targets (timm semantics)."""
    r_kind, r_lam, r_box = jax.random.split(rng, 3)
    use_cutmix = jax.random.bernoulli(r_kind)
    perm_img = images[::-1]
    perm_lab = labels_onehot[::-1]

    lam_mix = jax.random.beta(r_lam, mixup_alpha, mixup_alpha)
    lam_cut = jax.random.beta(r_lam, cutmix_alpha, cutmix_alpha)

    h, w = images.shape[1], images.shape[2]
    cut_ratio = jnp.sqrt(1.0 - lam_cut)
    ch, cw = (cut_ratio * h).astype(jnp.int32), (cut_ratio * w).astype(jnp.int32)
    cy = jax.random.randint(r_box, (), 0, h)
    cx = jax.random.randint(jax.random.fold_in(r_box, 1), (), 0, w)
    y0, y1 = jnp.clip(cy - ch // 2, 0, h), jnp.clip(cy + ch // 2, 0, h)
    x0, x1 = jnp.clip(cx - cw // 2, 0, w), jnp.clip(cx + cw // 2, 0, w)
    yy = jnp.arange(h)[None, :, None, None]
    xx = jnp.arange(w)[None, None, :, None]
    in_box = (yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1)
    lam_cut_eff = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)

    img_mix = lam_mix * images + (1 - lam_mix) * perm_img
    img_cut = jnp.where(in_box, perm_img, images)
    images = jnp.where(use_cutmix, img_cut, img_mix)
    lam = jnp.where(use_cutmix, lam_cut_eff, lam_mix)
    labels = lam * labels_onehot + (1 - lam) * perm_lab
    return images, labels


def soft_target_xent(logits: jax.Array, soft_targets: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(soft_targets * logp).sum(-1).mean()


def image_batches(cfg: ViTTrainConfig, rng: np.random.Generator):
    if cfg.data_dir and Path(cfg.data_dir).exists():
        # timm train recipe: random-resized-crop + hflip + RandAugment +
        # random erasing (reference mhla_image_classification/timm_train.py)
        from ..data.image_data import ImageAugConfig, ImageFolderDataset

        ds = ImageFolderDataset(
            cfg.data_dir,
            ImageAugConfig(img_size=cfg.img_size, train=True),
            seed=cfg.train.seed,
        )
        yield from ds.infinite(cfg.train.batch_size)
    else:
        while True:
            x = rng.standard_normal(
                (cfg.train.batch_size, cfg.img_size, cfg.img_size, 3), np.float32
            )
            y = rng.integers(0, cfg.num_classes, cfg.train.batch_size).astype(np.int32)
            yield x, y


def val_batches(cfg: ViTTrainConfig, n: int):
    """Deterministic held-out batches: ``val_dir`` (eval transforms: resize +
    center crop, no augmentation) or a FIXED synthetic set (seed offset so it
    never overlaps the synthetic train stream)."""
    if cfg.val_dir and Path(cfg.val_dir).exists():
        from ..data.image_data import ImageAugConfig, ImageFolderDataset

        ds = ImageFolderDataset(
            cfg.val_dir,
            ImageAugConfig(img_size=cfg.img_size, train=False),
            seed=0,
        )
        it = ds.infinite(cfg.train.batch_size)
        return [next(it) for _ in range(n)]
    rng = np.random.default_rng(cfg.train.seed + 10_000)
    return [
        (
            rng.standard_normal(
                (cfg.train.batch_size, cfg.img_size, cfg.img_size, 3),
                np.float32,
            ),
            rng.integers(0, cfg.num_classes, cfg.train.batch_size).astype(
                np.int32
            ),
        )
        for _ in range(n)
    ]


def main(argv=None) -> dict:
    cfg = parse_cli(ViTTrainConfig, argv if argv is not None else sys.argv[1:])
    logger = get_root_logger(f"{cfg.work_dir}/train.log")
    dump_config(cfg, f"{cfg.work_dir}/config.yaml")

    model, model_cfg = build_vit(
        cfg.model_name,
        img_size=cfg.img_size,
        piece_size=cfg.piece_size,
        transform=cfg.transform,
        exp_sigma=cfg.exp_sigma,
        num_classes=cfg.num_classes,
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
    )
    rng = jax.random.PRNGKey(cfg.train.seed)
    x0 = jnp.zeros((2, cfg.img_size, cfg.img_size, 3))
    params = model.init(rng, x0)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    logger.info(f"{cfg.model_name}: {n_params/1e6:.1f}M params")

    tx = make_optimizer(cfg.optimizer)
    mesh = make_mesh()
    nc = cfg.num_classes
    sm = cfg.train.label_smoothing

    def loss_fn(p, batch, step_rng):
        x, y = batch
        onehot = jax.nn.one_hot(y, nc) * (1 - sm) + sm / nc
        if cfg.train.mixup_prob > 0:
            x, onehot = mixup_cutmix(
                step_rng, x, onehot, cfg.train.mixup_alpha, cfg.train.cutmix_alpha
            )
        logits = model.apply(p, x.astype(jnp.bfloat16 if cfg.bf16 else jnp.float32),
                             deterministic=False)
        loss = soft_target_xent(logits, onehot)
        acc = (jnp.argmax(logits, -1) == y).mean()
        return loss, {"acc": acc}

    @jax.jit
    def eval_correct(p, x, y):
        logits = model.apply(
            p, x.astype(jnp.bfloat16 if cfg.bf16 else jnp.float32),
            deterministic=True,
        )
        return (jnp.argmax(logits, -1) == y).sum()

    def run_validation(state) -> dict:
        """Held-out top-1 with the live params and the EMA params (the
        reference validates both each epoch and checkpoints on EMA top-1)."""
        batches = val_batches(cfg, cfg.train.eval_batches)
        totals = {"val_acc": 0.0, "val_acc_ema": 0.0}
        n = 0
        for x, y in batches:
            x, y = jnp.asarray(x), jnp.asarray(y)
            totals["val_acc"] += float(eval_correct(state.params, x, y))
            if state.ema_params is not None:
                totals["val_acc_ema"] += float(
                    eval_correct(state.ema_params, x, y)
                )
            n += y.shape[0]
        return {k: v / max(n, 1) for k, v in totals.items()}

    with mesh:
        state = init_train_state_sharded(params, tx, mesh, ema=True)
        step_fn = make_train_step(loss_fn, tx, ema_decay=cfg.train.ema_decay)
        start = 0
        if cfg.train.resume_from:
            path = resolve_resume_path(cfg.work_dir, cfg.train.resume_from)
            if path:
                state = load_checkpoint(path, state)
                start = checkpoint_step(path)

        data = image_batches(cfg, np.random.default_rng(cfg.train.seed))
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
            buf.update(loss=last, acc=float(metrics["acc"]))
            if (i + 1) % cfg.train.log_interval == 0:
                speed = thr.step(i + 1, cfg.train.batch_size)
                avg = buf.average()
                logger.info(
                    f"step {i+1}/{cfg.train.max_steps} loss {avg['loss']:.4f} "
                    f"acc {avg['acc']:.3f} {speed['items_per_sec']:.1f} img/s"
                )
            if (
                cfg.train.eval_interval
                and (i + 1) % cfg.train.eval_interval == 0
            ):
                val = run_validation(state)
                logger.info(
                    f"step {i+1} val_acc {val['val_acc']:.4f} "
                    f"val_acc_ema {val['val_acc_ema']:.4f}"
                )
            if (i + 1) % cfg.train.save_interval == 0:
                save_checkpoint(cfg.work_dir, i + 1, state)
        save_checkpoint(cfg.work_dir, cfg.train.max_steps, state)
        final_val = (
            run_validation(state) if cfg.train.eval_interval else {}
        )
    return {"final_loss": last, "params": n_params, **final_val}


if __name__ == "__main__":
    main()

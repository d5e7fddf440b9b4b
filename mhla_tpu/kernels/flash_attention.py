"""Flash (softmax) attention for TPU — the baseline the reference gets from
flash-attn 2/3 (``mhla_videogen/.../wan/attention.py:31-180``) and the compute
path of the hybrid softmax layers.

On TPU the fused kernel is Pallas flash attention (the library kernel
shipped with JAX, ``jax.experimental.pallas.ops.tpu.flash_attention``); on
CPU (tests) it falls back to ``jax.nn.dot_product_attention``. Layout is
[B, T, H, D] at the API; the kernel wants [B, H, T, D].

Sequence lengths that don't divide the kernel block size (e.g. Wan's 31,500
video tokens) are zero-padded to the next block multiple and masked out via
segment ids (padded tokens get a different segment, so no probability mass
leaks to them), then sliced back.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("causal", "scale"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    scale: Optional[float] = None,
    segment_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """[B, T, H, D] flash attention; fp32 softmax accumulation.

    ``segment_ids`` [B, T]: tokens attend only within their own segment
    (packed-varlen document isolation); rides the same SegmentIds mechanism
    the kernel already uses for block-size padding.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if not _on_tpu():
        if segment_ids is None:
            return jax.nn.dot_product_attention(
                q, k, v, scale=scale, is_causal=causal
            )
        t = q.shape[1]
        keep = segment_ids[:, :, None] == segment_ids[:, None, :]
        if causal:
            keep = keep & (jnp.arange(t)[:, None] >= jnp.arange(t)[None, :])
        return jax.nn.dot_product_attention(
            q, k, v, scale=scale, mask=keep[:, None]
        )

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention as pallas_flash,
    )

    b, t, h, d = q.shape
    blk = min(512, t)
    pad = (-t) % blk
    seg = segment_ids
    if pad:
        zeros = lambda x: jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))  # noqa: E731
        q, k, v = zeros(q), zeros(k), zeros(v)
        if seg is None:
            seg = (jnp.arange(t + pad) >= t).astype(jnp.int32)[None, :].repeat(b, 0)
        else:
            # pads get a segment no real token carries (ids are >= 0)
            seg = jnp.pad(seg.astype(jnp.int32), ((0, 0), (0, pad)), constant_values=-1)
    segment_ids = SegmentIds(q=seg, kv=seg) if seg is not None else None

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    o = pallas_flash(
        qt, kt, vt, segment_ids=segment_ids, causal=causal, sm_scale=scale,
        block_sizes=sizes,
    )
    o = o.transpose(0, 2, 1, 3)
    return o[:, :t] if pad else o

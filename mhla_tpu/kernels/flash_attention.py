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
    tk = k.shape[1]
    assert not causal or tk == t, "causal flash needs equal q/kv lengths"
    assert segment_ids is None or tk == t, "packed varlen is self-attn only"
    blk = min(512, t)
    blk_k = min(512, ((tk + 127) // 128) * 128)  # kv blocks need 128-mult
    pad = (-t) % blk
    pad_k = (-tk) % blk_k
    seg = segment_ids
    need_seg = pad or pad_k or seg is not None
    if need_seg and seg is None:
        seg = jnp.zeros((b, t), jnp.int32)
    if pad or pad_k:
        zeros = lambda x, p: jnp.pad(  # noqa: E731
            x, ((0, 0), (0, p), (0, 0), (0, 0))
        )
        q = zeros(q, pad)
        k, v = zeros(k, pad_k), zeros(v, pad_k)
    seg_q = seg_kv = None
    if need_seg:
        # pads get a segment no real token carries (ids are >= 0); kv pads
        # MUST be masked (they'd receive probability mass), q pads are
        # sliced off but keep a distinct id so their softmax stays sane
        seg_q = jnp.pad(
            seg.astype(jnp.int32), ((0, 0), (0, pad)), constant_values=-1
        )
        seg_kv = (
            seg_q
            if tk == t and pad_k == pad
            else jnp.pad(
                (seg if tk == t else jnp.zeros((b, tk), jnp.int32)).astype(
                    jnp.int32
                ),
                ((0, 0), (0, pad_k)),
                constant_values=-2,
            )
        )
    segment_ids = (
        SegmentIds(q=seg_q, kv=seg_kv) if seg_q is not None else None
    )

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk_k, block_k=blk_k, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk_k,
        block_k_dkv=blk_k, block_q_dkv=blk,
        block_k_major_dq=blk_k, block_k_dq=blk_k, block_q_dq=blk,
    )
    o = pallas_flash(
        qt, kt, vt, segment_ids=segment_ids, causal=causal, sm_scale=scale,
        block_sizes=sizes,
    )
    o = o.transpose(0, 2, 1, 3)
    return o[:, :t] if pad else o

"""Softmax attention baselines (the drop-in alternatives to MHLA).

Covers the reference's softmax layers behind one module: the fla hybrid
``Attention`` (``mhla_nlp/fla/layers/attn.py``, causal + RoPE + GQA +
optional sliding window), the timm ``FlashAttention`` block attention
(``mhla_image_classification/.../timm_block/self_attn.py``), and
``WanSelfAttention`` (``mhla_videogen/.../wan/model.py:211-287``).

The compute path is ``jax.nn.dot_product_attention`` (XLA flash-pattern
fusion on TPU); ``mhla_tpu.kernels.flash_attention`` provides the Pallas
kernel used at long sequence lengths.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import apply_rotary, rotary_cos_sin
from .norms import RMSNorm


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    window: Optional[int] = None,
    mask: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled dot-product attention over [B, T, H, D] tensors.

    Long-query sequences on TPU dispatch to the Pallas flash kernel — for
    self-attention AND cross-attention: XLA's einsum path materializes the
    fp32 [Tq, Tk] scores, which is 2 GB+ at Wan's 31.5k self-attention and
    still ~0.8 GB of HBM round-trips against a 512-token text context
    (measured 6.0 ms of a WanBlock's 27 ms; the flash path cuts it to the
    ~2 ms stream floor). Short cases stay on the fused XLA path.
    ``mask`` is a broadcastable boolean [B, H, Tq, Tk] keep-mask;
    ``segment_ids`` [B, T] restricts attention within packed documents.
    """
    if (
        window is None
        and mask is None
        and q.shape[1] >= 2048
        and (q.shape[1] == k.shape[1] or (not causal and segment_ids is None))
        and k.shape[1] >= 128
        and jax.default_backend() == "tpu"
        and q.shape[-1] % 128 == 0
    ):
        from ..kernels.flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal, segment_ids=segment_ids)
    if segment_ids is not None:
        same = segment_ids[:, :, None] == segment_ids[:, None, :]
        same = same[:, None]  # [B, 1, T, T]
        mask = same if mask is None else (mask & same)
    local_window = (window - 1, 0) if window else None
    return jax.nn.dot_product_attention(
        q, k, v, mask=mask, is_causal=causal, local_window_size=local_window
    )


class SelfAttention(nn.Module):
    """Multi-head softmax self-attention with optional causality/RoPE/GQA."""

    hidden_size: int
    num_heads: int
    num_kv_heads: Optional[int] = None
    causal: bool = True
    qkv_bias: bool = False
    qk_norm: bool = False
    window_size: Optional[int] = None
    rope: bool = True
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, hidden]
        kv_cache: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
        use_cache: bool = False,
        segment_ids: Optional[jax.Array] = None,  # [B, T] packed-varlen docs
    ):
        b, t, _ = x.shape
        h = self.num_heads
        kv_h = self.num_kv_heads or h
        d = self.hidden_size // h

        dense = lambda n, name: nn.Dense(  # noqa: E731
            n, use_bias=self.qkv_bias, dtype=self.dtype, name=name
        )
        q = dense(h * d, "q_proj")(x).reshape(b, t, h, d)
        k = dense(kv_h * d, "k_proj")(x).reshape(b, t, kv_h, d)
        v = dense(kv_h * d, "v_proj")(x).reshape(b, t, kv_h, d)

        if self.qk_norm:
            q = RMSNorm(name="q_norm", eps=self.norm_eps)(q)
            k = RMSNorm(name="k_norm", eps=self.norm_eps)(k)

        offset = 0
        if kv_cache is not None:
            offset = kv_cache[2]

        if self.rope:
            cos, sin = rotary_cos_sin(
                self.max_position_embeddings, d, self.rope_theta
            )
            if segment_ids is not None:
                # packed varlen: positions restart at each document
                from ..ops.mhla_chunk import segment_positions

                pos = segment_positions(segment_ids)
                cos_t = cos[pos][:, :, None, :]  # [B, T, 1, D/2]
                sin_t = sin[pos][:, :, None, :]
                rot = lambda x: jnp.concatenate(  # noqa: E731
                    [
                        x[..., : cos.shape[-1]] * cos_t
                        - x[..., cos.shape[-1] :] * sin_t,
                        x[..., cos.shape[-1] :] * cos_t
                        + x[..., : cos.shape[-1]] * sin_t,
                    ],
                    axis=-1,
                ).astype(x.dtype)
                q, k = rot(q), rot(k)
            else:
                q = apply_rotary(q, cos, sin, offset=offset)
                k = apply_rotary(k, cos, sin, offset=offset)

        new_cache = None
        if kv_cache is not None:
            k_buf, v_buf, _ = kv_cache
            k_buf = jax.lax.dynamic_update_slice_in_dim(k_buf, k, offset, axis=1)
            v_buf = jax.lax.dynamic_update_slice_in_dim(v_buf, v, offset, axis=1)
            mask_len = k_buf.shape[1]
            pos = jnp.arange(mask_len)[None, :] <= (offset + t - 1)
            bias = jnp.where(pos, 0.0, -jnp.inf).astype(jnp.float32)
            o = jax.nn.dot_product_attention(
                q, k_buf, v_buf, bias=bias[None, None, :, :].repeat(t, axis=2)
            )
            new_cache = (k_buf, v_buf, offset + t)
        else:
            if kv_h != h:
                k = jnp.repeat(k, h // kv_h, axis=2)
                v = jnp.repeat(v, h // kv_h, axis=2)
            o = sdpa(
                q, k, v, causal=self.causal, window=self.window_size,
                segment_ids=segment_ids,
            )
            if use_cache:
                new_cache = (k, v, t)

        o = o.reshape(b, t, h * d)
        o = nn.Dense(
            self.hidden_size, use_bias=False, dtype=self.dtype, name="o_proj"
        )(o)
        return o, new_cache

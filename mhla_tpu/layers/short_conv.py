"""Causal short (depthwise) convolution with decode cache.

Reference: ``fla.modules.ShortConvolution`` (``mhla_nlp/fla/modules/convolution.py``)
— a kernel_size-4 causal depthwise conv over time with optional SiLU,
optionally carrying a conv state for decoding. On TPU the training path is a
plain ``lax.conv_general_dilated`` with left padding (depthwise); the decode
update is an O(kernel) shift-and-dot.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ShortConvolution(nn.Module):
    features: int
    kernel_size: int = 4
    use_bias: bool = False
    activation: Optional[str] = "silu"
    dtype: jnp.dtype = jnp.float32

    def _act(self, x):
        if self.activation == "silu":
            return jax.nn.silu(x)
        if self.activation is None:
            return x
        raise ValueError(f"unsupported activation {self.activation}")

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, D]
        cache: Optional[jax.Array] = None,  # [B, kernel_size-1, D]
        output_final_state: bool = False,
        segment_ids: Optional[jax.Array] = None,  # [B, T]
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.features),
            jnp.float32,
        ).astype(x.dtype)
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            .astype(x.dtype)
            if self.use_bias
            else None
        )

        pad = self.kernel_size - 1
        if cache is not None:
            ctx = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
        else:
            ctx = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))

        # depthwise causal conv: windows of length kernel_size ending at t.
        # With segment_ids (packed varlen), taps that reach across a document
        # boundary are zeroed — exactly the reference's cu_seqlens conv reset
        # (``fla/modules/convolution.py`` varlen path) with static shapes.
        seg_ctx = None
        if segment_ids is not None:
            pad_seg = jnp.full(
                (segment_ids.shape[0], self.kernel_size - 1), -1, segment_ids.dtype
            )
            seg_ctx = jnp.concatenate([pad_seg, segment_ids], axis=1)
        y = jnp.zeros_like(x)
        for i in range(self.kernel_size):
            tap = ctx[:, i : i + x.shape[1]]
            if seg_ctx is not None:
                same = seg_ctx[:, i : i + x.shape[1]] == segment_ids
                tap = tap * same[..., None].astype(tap.dtype)
            y = y + tap * w[i]
        if b is not None:
            y = y + b
        y = self._act(y)

        new_cache = None
        if output_final_state:
            new_cache = ctx[:, -pad:] if pad > 0 else ctx[:, :0]
        return y, new_cache

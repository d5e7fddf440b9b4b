"""Global linear-attention baselines (the ablation points around MHLA).

- :class:`LinearAttention2D`: ViT baseline — full-dim RMSNorm on q/k, relu
  feature map, global KV state, per-token normalizer
  (``mhla_image_classification/models/modules/attention/linear_attn.py:51-93``).
- :class:`WanLinearAttention`: video baseline — relu kernel, optional
  ``power`` sharpening with norm preservation, optional RoPE after the
  kernel, normalizer from the *mean* key (``wan/model.py:290-426``,
  rope_after branch :360-400).
- MLLA legacy baselines (``wan/model.py:1391-1530``): ``mlla='linear'`` /
  ``mlla='lepe'`` modes adding the :class:`STConv3D` SiLU pre-transform,
  the relu (resp. elu+1) kernel with the reference's rope ordering, and —
  for lepe — an STConv positional branch on v. The reference's
  ``attn_matmul`` PAD_VAL trick (pad v with a ones row so one matmul chain
  yields output and normalizer together) is exactly the sum-key
  normalizer, i.e. :func:`linear_attention` (golden-tested against the
  pad formulation in ``tests/test_layers.py``).

These exist for parity/ablation: the reference shows plain linear attention
collapses at video scale (README table) — MHLA is the fix.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import rope_angles_3d
from ..ops.rotary import apply_rotary_3d_halves
from .norms import RMSNorm


def linear_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """Normalized global linear attention over [B, T, H, D] (fp32 compute)."""
    f32 = jnp.float32
    q, k, v = q.astype(f32), k.astype(f32), v.astype(f32)
    kv = jnp.einsum("bthk,bthv->bhkv", k, v)
    out = jnp.einsum("bthk,bhkv->bthv", q, kv)
    z = jnp.einsum("bthk,bhk->bth", q, jnp.sum(k, axis=1)) + eps
    return out / z[..., None]


class LinearAttention2D(nn.Module):
    dim: int
    num_heads: int = 8
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, T, dim] flat tokens."""
        b, t, _ = x.shape
        h = self.num_heads
        d = self.dim // h
        qkv = nn.Dense(3 * self.dim, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = RMSNorm(name="q_norm", eps=self.eps)(q)
        k = RMSNorm(name="k_norm", eps=self.eps)(k)
        q, k = jax.nn.relu(q), jax.nn.relu(k)
        q, k, v = (z.reshape(b, t, h, d) for z in (q, k, v))
        out = linear_attention(q, k, v, self.eps).astype(x.dtype)
        out = out.reshape(b, t, self.dim)
        return nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="to_out")(out)


class STConv3D(nn.Module):
    """Depthwise spatial 3x3 then depthwise temporal 3 conv over a video
    token grid (reference ``STConv``, ``wan/model.py:1391-1406``). Input
    [B, F*H*W, C] (F-major raster) + static grid; NHWC depthwise convs —
    channel-minor layouts keep the 8x128 VPU lanes full on TPU."""

    dim: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, grid: Tuple[int, int, int]) -> jax.Array:
        b = x.shape[0]
        f, hh, ww = grid
        c = self.dim
        ks = self.kernel_size
        x5 = x.reshape(b * f, hh, ww, c)
        x5 = nn.Conv(
            features=c, kernel_size=(ks, ks), padding="SAME",
            feature_group_count=c, dtype=self.dtype, name="spatial_conv",
        )(x5)
        # [B, F, H, W, C] -> [B*H*W, F, C] for the temporal depthwise conv
        xt = x5.reshape(b, f, hh * ww, c).swapaxes(1, 2).reshape(b * hh * ww, f, c)
        xt = nn.Conv(
            features=c, kernel_size=(ks,), padding="SAME",
            feature_group_count=c, dtype=self.dtype, name="temporal_conv",
        )(xt)
        return (
            xt.reshape(b, hh * ww, f, c).swapaxes(1, 2).reshape(b, f * hh * ww, c)
        )


class WanLinearAttention(nn.Module):
    dim: int
    num_heads: int = 12
    qk_norm: bool = True
    rope_after: bool = True
    without_rope: bool = False
    power: float = 1.0
    mlla: Optional[str] = None  # None | 'linear' | 'lepe' (legacy baselines)
    eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_max_pos: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, grid: Tuple[int, int, int]) -> jax.Array:
        """x: [B, F*H*W, dim]; grid: static (F, H, W)."""
        b, t, _ = x.shape
        h = self.num_heads
        d = self.dim // h

        if self.mlla not in (None, "linear", "lepe"):
            raise ValueError(
                f"mlla={self.mlla!r}: expected None, 'linear' or 'lepe' "
                "(the WanConfig-level names are 'mllalinear'/'mllalepe')"
            )
        dense = lambda name: nn.Dense(  # noqa: E731
            self.dim, use_bias=True, dtype=self.dtype, name=name
        )
        if self.mlla is not None:
            # MLLA pre-transform: SiLU(STConv(x)) REPLACES the token stream
            # (reference mllalinear/mllalepe fwd, model.py:1430-1432)
            x = jax.nn.silu(
                STConv3D(dim=self.dim, dtype=self.dtype, name="st_conv")(x, grid)
            )
        q, k, v = dense("q")(x), dense("k")(x), dense("v")(x)
        if self.qk_norm:
            q = RMSNorm(name="norm_q", eps=self.eps)(q)
            k = RMSNorm(name="norm_k", eps=self.eps)(k)
        q = q.reshape(b, t, h, d).astype(jnp.float32)
        k = k.reshape(b, t, h, d).astype(jnp.float32)
        v = v.reshape(b, t, h, d).astype(jnp.float32)

        angles = jnp.asarray(
            rope_angles_3d(grid, d, self.rope_theta, self.rope_max_pos), jnp.float32
        )

        def sharpen(z):
            if self.power == 1.0:
                return z
            norm = jnp.linalg.norm(z, axis=-1, keepdims=True)
            zp = z**self.power
            return zp / (jnp.linalg.norm(zp, axis=-1, keepdims=True) + 1e-6) * norm

        if self.mlla == "lepe":
            # elu+1 kernel BEFORE rope, sum-key normalizer over roped q/k
            # (reference MLLALePEAttention, model.py:1463-1530)
            q = jax.nn.elu(q) + 1.0
            k = jax.nn.elu(k) + 1.0
            out = linear_attention(
                apply_rotary_3d_halves(q, angles),
                apply_rotary_3d_halves(k, angles),
                v,
                self.eps,
            )
        elif self.mlla == "linear" or not self.rope_after:
            # rope BEFORE the relu kernel, sum-key normalizer
            # (base rope_after=False branch ≡ MLLALinearAttention's order)
            q = apply_rotary_3d_halves(q, angles)
            k = apply_rotary_3d_halves(k, angles)
            q, k = jax.nn.relu(q), jax.nn.relu(k)
            q, k = sharpen(q), sharpen(k)
            out = linear_attention(q, k, v, self.eps)
        else:
            q, k = jax.nn.relu(q), jax.nn.relu(k)
            q, k = sharpen(q), sharpen(k)
            q_rope = q if self.without_rope else apply_rotary_3d_halves(q, angles)
            k_rope = k if self.without_rope else apply_rotary_3d_halves(k, angles)
            # normalizer uses the *mean* no-rope key (reference :381-386)
            z = 1.0 / (
                jnp.einsum("bthk,bhk->bth", q, jnp.mean(k, axis=1)) + 1e-6
            )
            kv = jnp.einsum("bthk,bthv->bhkv", k_rope, v) / t
            out = jnp.einsum("bthk,bhkv->bthv", q_rope, kv) * z[..., None]

        out = out.astype(x.dtype).reshape(b, t, self.dim)
        if self.mlla == "lepe":
            # positional branch: depthwise STConv over v, summed pre-o_proj
            lepe = STConv3D(dim=self.dim, dtype=self.dtype, name="lepe_conv")(
                v.astype(x.dtype).reshape(b, t, self.dim), grid
            )
            out = out + lepe
        return dense("o")(out)

"""Non-causal MHLA attention layers for vision models.

- :class:`MHLA2D` unifies the ViT variant (``MHLA_Normed_Torch``,
  ``mhla_image_classification/.../attention/mhla.py:141-289``: fixed
  distance-derived mixing, 5x5 LePE) and the DiT variant (``MHLA4DiT``,
  ``mhla_dit/mhla/mhla.py:141-275``: trainable clamped mixing, 3x3 LePE,
  qkv bias) behind flags.
- :class:`MHLA3D` is the video variant (``MHLA_Video_Uni``,
  ``mhla_videogen/.../wan/mhla_utils.py:158-366``): separate q/k/v/g
  projections with bias, full-dim RMSNorm on q/k, relu feature map, 3D RoPE
  applied *after* the feature map, no-RoPE k for the normalizer, gated
  (SiLU) output with per-head RMSNorm.

Inputs are block-major: [B, N_blocks, C_block, dim] for 2D; the 3D layer
takes flat tokens [B, T, dim] plus the (F, H, W) grid and performs the
3D block rearrange internally.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import block_mixing_matrix, rope_angles_3d
from ..ops.mhla_blockwise import mhla_blockwise_mh
from ..ops.rotary import apply_rotary_3d_halves
from .norms import LayerNorm, RMSNorm


class BlockMixing(nn.Module):
    """The [N, N] block-state mixing weights.

    Fixed (buffer) or trainable (parameter initialized from the distance
    transform). The reference clamps the trainable DiT matrix to [0, 1]
    after each optimizer step (``mhla_dit/train.py:308-310``); here the
    clamp is a projection applied at read time, which keeps the forward
    within [0, 1] regardless of trainer wiring.
    """

    blocks_layout: Sequence[int]
    transform: str = "linear"
    local_thres: float = 1.5
    exp_sigma: float = 3.0
    trainable: bool = False

    @nn.compact
    def __call__(self) -> jax.Array:
        init = block_mixing_matrix(
            tuple(self.blocks_layout), self.transform, self.local_thres, self.exp_sigma
        )
        if self.trainable:
            w = self.param("weight", lambda _rng: jnp.asarray(init))
            return jnp.clip(w, 0.0, 1.0)
        return jnp.asarray(init)


def _depthwise_conv(x: jax.Array, kernel: int, dims: int, name: str, module) -> jax.Array:
    """Depthwise 'same' conv over the trailing spatial dims of NH...WC input."""
    return nn.Conv(
        features=x.shape[-1],
        kernel_size=(kernel,) * dims,
        padding="SAME",
        feature_group_count=x.shape[-1],
        name=name,
        dtype=x.dtype,
    )(x)


class MHLA2D(nn.Module):
    dim: int
    num_heads: int = 8
    blocks_per_side: int = 4  # N = blocks_per_side**2 blocks
    block_len: int = 4  # C = block_len**2 tokens per block
    transform: str = "cos"  # ViT default; DiT uses "linear"
    local_thres: float = 1.5
    exp_sigma: float = 3.0
    trainable_mixing: bool = False  # True for DiT
    qkv_bias: bool = False  # True for DiT
    qk_norm: bool = False
    lepe_kernel: int = 5  # 5 for ViT, 3 for DiT
    eps: float = 1e-6
    use_input_norm: bool = True  # reference applies LayerNorm inside attn
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """x: [B, N_blocks, C_block, dim] (block-major tokens)."""
        b, n, c, _ = x.shape
        h = self.num_heads
        d = self.dim // h
        p = self.blocks_per_side
        w = self.block_len

        if self.use_input_norm:
            x = LayerNorm(name="norm")(x)

        qkv = nn.Dense(
            3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="to_qkv"
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # LePE positional term: depthwise conv of v on the spatial grid
        v_spatial = (
            v.reshape(b, p, p, w, w, self.dim)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, p * w, p * w, self.dim)
        )
        lepe = _depthwise_conv(v_spatial, self.lepe_kernel, 2, "lepe", self)
        lepe = (
            lepe.reshape(b, p, w, p, w, self.dim)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, n, c, self.dim)
        )

        if self.qk_norm:
            q = RMSNorm(name="q_norm", eps=self.eps)(q)
            k = RMSNorm(name="k_norm", eps=self.eps)(k)
        q = jax.nn.relu(q) + self.eps
        k = jax.nn.relu(k) + self.eps

        q, k, v = (t.reshape(b, n, c, h, d) for t in (q, k, v))
        m = BlockMixing(
            blocks_layout=(p, p),
            transform=self.transform,
            local_thres=self.local_thres,
            exp_sigma=self.exp_sigma,
            trainable=self.trainable_mixing,
            name="piece_attn",
        )()
        out = mhla_blockwise_mh(q, k, v, m, eps=self.eps)
        out = out.reshape(b, n, c, self.dim) + lepe

        out = nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="to_out")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


def rearrange_to_blocks_3d(
    x: jax.Array, grid: Sequence[int], layout: Sequence[int]
) -> jax.Array:
    """[B, F*H*W, ...] -> [B, N_blocks, C_block, ...] with 3D block-major order.

    Matches the reference pattern ``(fb p1 hb p2 wb p3) -> (fb hb wb)(p1 p2 p3)``
    (``mhla_utils.py:317-326``).
    """
    b = x.shape[0]
    f, hh, ww = grid
    fb, hb, wb = layout
    p1, p2, p3 = f // fb, hh // hb, ww // wb
    tail = x.shape[2:]
    x = x.reshape(b, fb, p1, hb, p2, wb, p3, *tail)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, *range(7, 7 + len(tail)))
    return x.reshape(b, fb * hb * wb, p1 * p2 * p3, *tail)


def rearrange_from_blocks_3d(
    x: jax.Array, grid: Sequence[int], layout: Sequence[int]
) -> jax.Array:
    """Inverse of :func:`rearrange_to_blocks_3d`."""
    b = x.shape[0]
    f, hh, ww = grid
    fb, hb, wb = layout
    p1, p2, p3 = f // fb, hh // hb, ww // wb
    tail = x.shape[3:]
    x = x.reshape(b, fb, hb, wb, p1, p2, p3, *tail)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, *range(7, 7 + len(tail)))
    return x.reshape(b, f * hh * ww, *tail)


class _HeadNormScale(nn.Module):
    """Bare per-head norm weight — same param tree as an ``RMSNorm`` module
    of the same name (params[name]["weight"] of shape [Dh]), so the fused
    flat path and the module path load identical checkpoints."""

    features: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "weight", nn.initializers.ones, (self.features,), jnp.float32
        )


class MHLA3D(nn.Module):
    """Video MHLA over an (F, H, W) token grid with 3D block mixing."""

    dim: int
    num_heads: int = 12
    blocks_layout: Tuple[int, int, int] = (3, 5, 10)
    transform: str = "linear"
    qk_norm: bool = True
    is_gated: bool = True
    is_lepe: bool = False
    # NOTE: RoPE is always applied AFTER the relu feature map (rope-after
    # only) — matching the reference ``MHLA_Video_Uni``, whose ``rope_after``
    # kwarg is likewise never read. The Wan config's ``rope_after`` field
    # only affects the ``WanLinearAttention`` baseline.
    without_rope: bool = False
    normalize_out: bool = True
    eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_max_pos: int = 1024
    dtype: jnp.dtype = jnp.float32
    # attention matmul precision: fp32 reproduces the reference's fp32
    # island (mhla_utils.py:308); bfloat16 runs on the MXU at ~4x with fp32
    # accumulation (norms/normalizer stay fp32 either way)
    attn_compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        grid: Tuple[int, int, int],
        rope_tables: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        """x: [B, F*H*W, dim]; grid: static (F, H, W). ``rope_tables``:
        optional precomputed (cos_flat, sin_signed_flat) [T, Dh] from
        ``rope_tables_flat``; callers with many layers (WanModel) hoist
        them so remat doesn't rebuild them per block."""
        b, t, _ = x.shape
        h = self.num_heads
        d = self.dim // h
        f, hh, ww = grid
        assert f * hh * ww == t, f"grid {grid} does not match {t} tokens"

        dense = lambda name: nn.Dense(  # noqa: E731
            self.dim, use_bias=True, dtype=self.dtype, name=name
        )
        q, k, v = dense("q")(x), dense("k")(x), dense("v")(x)

        lepe = None
        if self.is_lepe:
            v_sp = v.reshape(b, f, hh, ww, self.dim)
            lepe = _depthwise_conv(v_sp, 3, 3, "lepe", self).reshape(b, t, self.dim)

        # attention island: fp32 by default (reference casts q/k/v to float,
        # :308); with attn_compute_dtype=bf16 the streams stay bf16 between
        # ops (norms/rope still accumulate fp32 internally), halving the
        # bandwidth of the rearranges at 31.5k-token scale
        island_dt = self.attn_compute_dtype or jnp.float32

        m = BlockMixing(
            blocks_layout=self.blocks_layout,
            transform=self.transform,
            name="block_attn",
        )()

        from ..kernels.mhla_block_pallas import (
            blockify_island,
            mhla_blockwise_fused,
            rope_tables_flat,
            unblockify_island,
        )
        from ..kernels.mhla_chunk_pallas import _use_pallas

        fused = _use_pallas(8, d, d)

        if fused:
            # head-flat fast path: the whole island prologue (cast to the
            # island dtype, full-dim RMSNorm, relu feature map, 3D RoPE,
            # block rearrange) fuses into ONE Pallas pass per stream — the
            # projection output is read once in its native dtype instead of
            # paying cast/norm/relu/blockify as separate full HBM streams
            if self.without_rope:
                tables = None
            elif rope_tables is not None:
                tables = tuple(tb.astype(jnp.float32) for tb in rope_tables)
            else:
                tables = rope_tables_flat(
                    grid, d, h, jnp.float32, self.rope_theta, self.rope_max_pos
                )
            glt = (grid, self.blocks_layout, h)
            # mid_dtype replicates the composed path's rounding between ops
            # when the island runs narrower than fp32
            mid = None if island_dt == jnp.float32 else island_dt
            # param-compatible with the RMSNorm modules of the module path
            gq = (
                _HeadNormScale(self.dim, name="norm_q")()
                if self.qk_norm else None
            )
            gk = (
                _HeadNormScale(self.dim, name="norm_k")()
                if self.qk_norm else None
            )
            want_nope = self.normalize_out and tables is not None
            relu_eps = float(self.eps)
            qb, q_nope = blockify_island(
                q, tables, gq, *glt, self.eps, relu_eps, mid, island_dt,
                want_nope,
            )
            kb, k_nope = blockify_island(
                k, tables, gk, *glt, self.eps, relu_eps, mid, island_dt,
                want_nope,
            )
            vb, _ = blockify_island(
                v, None, None, *glt, self.eps, None, mid, island_dt, False
            )
            if self.normalize_out and tables is None:
                q_nope, k_nope = qb, kb  # no RoPE: nope streams == roped
            out = mhla_blockwise_fused(
                qb, kb, vb, m,
                num_heads=h,
                q_nope4=q_nope, k_nope4=k_nope,
                normalize=self.normalize_out, eps=self.eps,
                compute_dtype=self.attn_compute_dtype,
            )
            # fused epilogue: inverse rearrange + cast + per-head RMSNorm
            # (reference g_norm over dim_head; same param tree as the
            # RMSNorm module path below)
            w = _HeadNormScale(d, name="g_norm")()
            out = unblockify_island(
                out, w, *glt, self.eps,
                x.dtype if out.dtype != x.dtype else None, x.dtype,
            )
        else:
            q = q.astype(island_dt)
            k = k.astype(island_dt)
            v = v.astype(island_dt)
            if self.qk_norm:
                q = RMSNorm(name="norm_q", eps=self.eps)(q)
                k = RMSNorm(name="norm_k", eps=self.eps)(k)
            q = jax.nn.relu(q) + jnp.asarray(self.eps, island_dt)
            k = jax.nn.relu(k) + jnp.asarray(self.eps, island_dt)
            q5 = q.reshape(b, t, h, d)
            k5 = k.reshape(b, t, h, d)
            v5 = v.reshape(b, t, h, d)
            if self.without_rope:
                q_rope, k_rope = q5, k5
            else:
                angles = jnp.asarray(
                    rope_angles_3d(grid, d, self.rope_theta, self.rope_max_pos),
                    jnp.float32,
                )
                q_rope = apply_rotary_3d_halves(q5, angles)
                k_rope = apply_rotary_3d_halves(k5, angles)

            # one block rearrange over the concatenated streams (one 6D
            # transpose instead of 3-5; reference does the same 5-way
            # concat, mhla_utils.py:317-326)
            streams = [q_rope, k_rope, v5]
            if self.normalize_out:
                streams += [q5, k5]  # no-RoPE normalizer stream
            packed = rearrange_to_blocks_3d(
                jnp.concatenate(streams, axis=-1), grid, self.blocks_layout
            )
            parts = jnp.split(packed, len(streams), axis=-1)
            qb, kb, vb = parts[0], parts[1], parts[2]
            q_nope = parts[3] if self.normalize_out else None
            k_nope = parts[4] if self.normalize_out else None

            out = mhla_blockwise_mh(
                qb, kb, vb, m,
                q_nope=q_nope, k_nope=k_nope,
                normalize=self.normalize_out, eps=self.eps,
                compute_dtype=self.attn_compute_dtype,
            )
            out = rearrange_from_blocks_3d(
                out.reshape(*out.shape[:3], self.dim), grid, self.blocks_layout
            )
            out = out.astype(x.dtype)

            # per-head RMSNorm on the output (reference g_norm over dim_head)
            out = RMSNorm(name="g_norm", eps=self.eps)(
                out.reshape(b, t, h, d)
            ).reshape(b, t, self.dim)
        if self.is_gated:
            g = jax.nn.silu(dense("g")(x))
            out = out * g
        if lepe is not None:
            out = out + lepe
        return dense("o")(out)

"""Wan video diffusion transformer with hybrid MHLA/softmax attention.

TPU-native re-design of the Wan2.1 backbone + the reference's hybrid wrapper
(``mhla_videogen/diffusion/model/wan/model.py``: ``WanModel`` :1824-2389,
``WanAttentionBlock`` :1608-1774, ``Head`` :1777, ``WanLinearAttentionModel``
:2392-2666, ``init_model_configs`` :2669-2727):

- 3D conv patch embedding over (F, H, W) latents, patch (1, 2, 2)
- fp32 sinusoidal time embedding -> 6-way adaLN modulation (per-block
  learned modulation parameter added to the shared projection)
- per-layer attention schedule from ``linear_attn_idx``: listed layers run
  the MHLA variant (``mhla_uni`` -> :class:`~mhla_tpu.layers.MHLA3D`) or the
  linear baseline; the rest run softmax self-attention with 3D RoPE
- T5 text cross-attention every block (i2v adds CLIP-image keys/values)
- ``grid_adjust``: crop each grid axis down to a multiple of the block
  layout (the reference's hard-coded ``seq_len=31500`` / (30,52)->(30,50)
  crop, ``model.py:2583,2633-2637``, generalized)

The head-dim split for 3D RoPE is (d - 4*(d//6), 2*(d//6), 2*(d//6)) halves
(``model.py:1930-1934``) — equal to the (c-2*(c//3), c//3, c//3) split of
half-dim c used in ``mhla_utils.py``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import MHLA3D, WanLinearAttention, sdpa
from ..layers.norms import LayerNorm, RMSNorm
from ..ops import rope_angles_3d
from ..ops.rotary import apply_rotary_3d_halves


def sinusoidal_embedding_1d(dim: int, position: jax.Array) -> jax.Array:
    """fp32 sinusoid (cos first — reference ``model.py:127-137``)."""
    half = dim // 2
    freqs = jnp.power(
        10000.0, -jnp.arange(half, dtype=jnp.float32) / half
    )
    args = position.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)


@dataclasses.dataclass
class WanConfig:
    model_type: str = "t2v"  # t2v | i2v
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 16
    dim: int = 1536
    ffn_dim: int = 8960
    freq_dim: int = 256
    image_dim: int = 1280
    img_tokens: int = 257  # CLIP ViT-H/14 patch tokens + cls (i2v)
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 12
    num_layers: int = 30
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    # hybrid schedule
    linear_attn_idx: Optional[Tuple[int, ...]] = None
    attn_type: str = "mhla_uni"  # mhla_uni | linear | mllalinear | mllalepe | flash
    # radial block-sparse schedule: listed softmax layers run splash-kernel
    # sparse attention under the n-log-n frame-distance mask (reference
    # ``model.py:258-281`` flex/bsa path). At inference, timesteps >=
    # ``sparse_dense_from_t`` fall back to dense attention — the
    # reference's hardcoded early-step quality guard (``model.py:2554-2556``);
    # set None to disable the guard (training).
    sparse_attn_idx: Optional[Tuple[int, ...]] = None
    sparse_dense_from_t: Optional[float] = 850.0
    rope_after: bool = True
    without_rope: bool = False
    normalize_out: bool = False  # headline hybrid: norm_output false
    is_gated: bool = True
    is_lepe: bool = False
    block_layout: Tuple[int, int, int] = (3, 5, 10)
    grid_adjust: bool = True  # generalize mhla_adjust
    remat: bool = True
    dtype: Any = jnp.float32
    # MHLA attention matmul precision: None = fp32 (reference-faithful);
    # jnp.bfloat16 trades ~1e-3 relative error for ~4x MXU throughput
    attn_compute_dtype: Any = None

    def layer_attn_type(self, i: int) -> str:
        if self.linear_attn_idx is not None and i in self.linear_attn_idx:
            return self.attn_type
        if self.sparse_attn_idx is not None and i in self.sparse_attn_idx:
            return "sparse"
        return "flash"


WAN_1300M = dict(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30)
WAN_14B = dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40)


def build_wan_config(model_name: str = "Wan_T2V_1300M", **overrides) -> WanConfig:
    """Reference ``init_model_configs`` analogue."""
    if "1300M" in model_name or "1.3B" in model_name:
        base = WAN_1300M
    elif "14B" in model_name:
        base = WAN_14B
    else:
        raise ValueError(f"Model {model_name} not found")
    kwargs = dict(base)
    if "i2v" in model_name.lower():
        kwargs["model_type"] = "i2v"
    kwargs.update(overrides)
    return WanConfig(**kwargs)


class WanSelfAttention(nn.Module):
    """Softmax self-attention with 3D RoPE (reference ``model.py:211-287``,
    flash-attn on GPU -> fused SDPA / Pallas flash on TPU). With
    ``sparse=True`` the attention runs the radial block-sparse splash
    kernel (reference flex/bsa path, ``model.py:258-281``), optionally
    falling back to dense when ``use_dense`` (a traced bool from the
    denoising timestep) is set."""

    dim: int
    num_heads: int
    qk_norm: bool = True
    eps: float = 1e-6
    sparse: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        grid: Tuple[int, int, int],
        use_dense: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, t, _ = x.shape
        h, d = self.num_heads, self.dim // self.num_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            self.dim, use_bias=True, dtype=self.dtype, name=name
        )
        q = dense("q")(x)
        k = dense("k")(x)
        v = dense("v")(x)
        if self.qk_norm:
            q = RMSNorm(name="norm_q", eps=self.eps)(q)
            k = RMSNorm(name="norm_k", eps=self.eps)(k)
        q = q.reshape(b, t, h, d)
        k = k.reshape(b, t, h, d)
        v = v.reshape(b, t, h, d)
        angles = jnp.asarray(rope_angles_3d(grid, d), jnp.float32)
        q = apply_rotary_3d_halves(q, angles)
        k = apply_rotary_3d_halves(k, angles)
        if self.sparse:
            from ..kernels.sparse_attention import sparse_flash_attention

            if use_dense is not None:
                # lax.cond: only the selected branch executes per step
                o = jax.lax.cond(
                    use_dense.astype(jnp.bool_),
                    lambda ops: sdpa(*ops, causal=False),
                    lambda ops: sparse_flash_attention(
                        *ops, num_frames=grid[0]
                    ),
                    (q, k, v),
                )
            else:
                o = sparse_flash_attention(q, k, v, num_frames=grid[0])
        else:
            o = sdpa(q, k, v, causal=False)
        o = o.reshape(b, t, self.dim)
        return dense("o")(o)


class WanCrossAttention(nn.Module):
    """Text (t2v) or text+image (i2v) cross-attention
    (``model.py:1525-1585``)."""

    dim: int
    num_heads: int
    qk_norm: bool = True
    eps: float = 1e-6
    i2v: bool = False
    img_tokens: int = 257
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        b, t, _ = x.shape
        h, d = self.num_heads, self.dim // self.num_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            self.dim, use_bias=True, dtype=self.dtype, name=name
        )
        q = dense("q")(x)
        if self.qk_norm:
            q = RMSNorm(name="norm_q", eps=self.eps)(q)
        q = q.reshape(b, t, h, d)

        if self.i2v:
            ctx_img, ctx = context[:, : self.img_tokens], context[:, self.img_tokens :]
        else:
            ctx = context

        k = dense("k")(ctx)
        if self.qk_norm:
            k = RMSNorm(name="norm_k", eps=self.eps)(k)
        k = k.reshape(b, -1, h, d)
        v = dense("v")(ctx).reshape(b, -1, h, d)
        o = sdpa(q, k, v, causal=False).reshape(b, t, self.dim)

        if self.i2v:
            k_img = dense("k_img")(ctx_img)
            k_img = RMSNorm(name="norm_k_img", eps=self.eps)(k_img).reshape(b, -1, h, d)
            v_img = dense("v_img")(ctx_img).reshape(b, -1, h, d)
            o = o + sdpa(q, k_img, v_img, causal=False).reshape(b, t, self.dim)
        return dense("o")(o)


class WanBlock(nn.Module):
    cfg: WanConfig
    layer_idx: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, dim]
        e0: jax.Array,  # [B, 6, dim] fp32 shared modulation
        context: jax.Array,  # [B, L_ctx, dim]
        grid: Tuple[int, int, int],
        use_dense: Optional[jax.Array] = None,  # sparse layers' t>=850 guard
        capture: bool = False,  # functional intermediates (remat-safe)
        rope_tables: Optional[Tuple[jax.Array, jax.Array]] = None,
    ):
        cfg = self.cfg
        modulation = self.param(
            "modulation",
            nn.initializers.normal(cfg.dim**-0.5),
            (1, 6, cfg.dim),
            jnp.float32,
        )
        e = modulation + e0.astype(jnp.float32)  # [B, 6, dim]
        e = [e[:, i] for i in range(6)]

        attn_type = cfg.layer_attn_type(self.layer_idx)
        h = LayerNorm(use_bias=False, use_scale=False, eps=cfg.eps, name="norm1")(x)
        h = (h.astype(jnp.float32) * (1 + e[1][:, None]) + e[0][:, None]).astype(x.dtype)
        if attn_type == "mhla_uni":
            h = MHLA3D(
                dim=cfg.dim,
                num_heads=cfg.num_heads,
                blocks_layout=cfg.block_layout,
                qk_norm=cfg.qk_norm,
                is_gated=cfg.is_gated,
                is_lepe=cfg.is_lepe,
                without_rope=cfg.without_rope,
                normalize_out=cfg.normalize_out,
                eps=cfg.eps,
                dtype=cfg.dtype,
                attn_compute_dtype=cfg.attn_compute_dtype,
                name="self_attn",
            )(h, grid, rope_tables)
        elif attn_type in ("linear", "mllalinear", "mllalepe"):
            h = WanLinearAttention(
                dim=cfg.dim,
                num_heads=cfg.num_heads,
                qk_norm=cfg.qk_norm,
                rope_after=cfg.rope_after,
                without_rope=cfg.without_rope,
                mlla={"mllalinear": "linear", "mllalepe": "lepe"}.get(attn_type),
                eps=cfg.eps,
                dtype=cfg.dtype,
                name="self_attn",
            )(h, grid)
        else:  # softmax (dense flash or radial block-sparse)
            h = WanSelfAttention(
                dim=cfg.dim,
                num_heads=cfg.num_heads,
                qk_norm=cfg.qk_norm,
                eps=cfg.eps,
                sparse=attn_type == "sparse",
                dtype=cfg.dtype,
                name="self_attn",
            )(h, grid, use_dense)
        # attention-output capture (reference AttentionHook, model.py:34-45;
        # drives distillation). Retrieved via mutable=['intermediates'], or
        # — remat-compatible — returned functionally with ``capture=True``.
        self.sow("intermediates", "attn_out", h)
        attn_out = h
        x = (x.astype(jnp.float32) + h.astype(jnp.float32) * e[2][:, None]).astype(
            x.dtype
        )

        h = (
            LayerNorm(eps=cfg.eps, name="norm3")(x)
            if cfg.cross_attn_norm
            else x
        )
        x = x + WanCrossAttention(
            dim=cfg.dim,
            num_heads=cfg.num_heads,
            qk_norm=cfg.qk_norm,
            eps=cfg.eps,
            i2v=cfg.model_type == "i2v",
            img_tokens=cfg.img_tokens,
            dtype=cfg.dtype,
            name="cross_attn",
        )(h, context)

        h = LayerNorm(use_bias=False, use_scale=False, eps=cfg.eps, name="norm2")(x)
        h = (h.astype(jnp.float32) * (1 + e[4][:, None]) + e[3][:, None]).astype(x.dtype)
        h = nn.Dense(cfg.ffn_dim, dtype=cfg.dtype, name="ffn_fc1")(h)
        h = jax.nn.gelu(h, approximate=True)
        h = nn.Dense(cfg.dim, dtype=cfg.dtype, name="ffn_fc2")(h)
        x = (x.astype(jnp.float32) + h.astype(jnp.float32) * e[5][:, None]).astype(
            x.dtype
        )
        # block-output capture (reference BlockHook, model.py:54-124)
        self.sow("intermediates", "block_out", x)
        if capture:
            return x, (attn_out, x)
        return x


class WanModel(nn.Module):
    """The full video DiT. Input latents are NDHWC: [B, F, H, W, C_in]."""

    cfg: WanConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, F, H, W, C_in]
        t: jax.Array,  # [B] timesteps (flow: t*1000)
        context: jax.Array,  # [B, text_len, text_dim]
        clip_fea: Optional[jax.Array] = None,  # [B, 257, image_dim] (i2v)
        capture: bool = False,  # also return per-block intermediates
    ):
        cfg = self.cfg
        b = x.shape[0]
        pf, ph, pw = cfg.patch_size

        h = nn.Conv(
            cfg.dim,
            kernel_size=cfg.patch_size,
            strides=cfg.patch_size,
            dtype=cfg.dtype,
            name="patch_embedding",
        )(x)
        f, gh, gw = h.shape[1], h.shape[2], h.shape[3]

        # crop each grid axis to a multiple of the block layout
        # (generalized mhla_adjust; (30, 52) -> (30, 50) in the reference)
        grid = (f, gh, gw)
        if cfg.grid_adjust and cfg.linear_attn_idx:
            grid = tuple(
                (g // l) * l for g, l in zip((f, gh, gw), cfg.block_layout)
            )
            h = h[:, : grid[0], : grid[1], : grid[2]]
        f, gh, gw = grid
        tokens = f * gh * gw
        h = h.reshape(b, tokens, cfg.dim)

        # time embedding (fp32 island, ``model.py:2598-2603``)
        e = sinusoidal_embedding_1d(cfg.freq_dim, t)
        e = nn.Dense(cfg.dim, dtype=jnp.float32, name="time_fc1")(e)
        e = jax.nn.silu(e)
        e = nn.Dense(cfg.dim, dtype=jnp.float32, name="time_fc2")(e)
        e0 = nn.Dense(cfg.dim * 6, dtype=jnp.float32, name="time_projection")(
            jax.nn.silu(e)
        ).reshape(b, 6, cfg.dim)

        # text embedding
        ctx = nn.Dense(cfg.dim, dtype=cfg.dtype, name="text_fc1")(context)
        ctx = jax.nn.gelu(ctx, approximate=True)
        ctx = nn.Dense(cfg.dim, dtype=cfg.dtype, name="text_fc2")(ctx)
        if cfg.model_type == "i2v":
            assert clip_fea is not None, "i2v requires clip image features"
            img = LayerNorm(name="img_norm_in")(clip_fea)
            img = nn.Dense(cfg.image_dim, dtype=cfg.dtype, name="img_fc1")(img)
            img = jax.nn.gelu(img, approximate=True)
            img = nn.Dense(cfg.dim, dtype=cfg.dtype, name="img_fc2")(img)
            img = LayerNorm(name="img_norm_out")(img)
            ctx = jnp.concatenate([img, ctx], axis=1)

        # the reference's inference-time quality guard: sparse layers run
        # dense attention while the denoising timestep is still >= 850
        use_dense = None
        if cfg.sparse_attn_idx is not None and cfg.sparse_dense_from_t is not None:
            use_dense = jnp.max(t) >= cfg.sparse_dense_from_t

        # hoist the MHLA3D rope tables: identical across layers, and (under
        # remat) rebuilt per block otherwise — two [T, Dh] fp32 tables
        rope_tables = None
        if cfg.linear_attn_idx and cfg.attn_type == "mhla_uni" and not cfg.without_rope:
            from ..kernels.mhla_block_pallas import rope_tables_flat
            from ..kernels.mhla_chunk_pallas import _use_pallas

            dh = cfg.dim // cfg.num_heads
            if _use_pallas(8, dh, dh):
                rope_tables = rope_tables_flat(grid, dh, cfg.num_heads)

        block_cls = (
            nn.remat(WanBlock, static_argnums=(4, 6)) if cfg.remat else WanBlock
        )
        caps = []
        for i in range(cfg.num_layers):
            h = block_cls(cfg, i, name=f"blocks_{i}")(
                h, e0, ctx, grid, use_dense, capture, rope_tables
            )
            if capture:
                h, cap = h
                caps.append(cap)

        # head: 2-way modulation + zero-meaning linear
        head_mod = self.param(
            "head_modulation",
            nn.initializers.normal(cfg.dim**-0.5),
            (1, 2, cfg.dim),
            jnp.float32,
        )
        em = head_mod + e.astype(jnp.float32)[:, None]
        hn = LayerNorm(use_bias=False, use_scale=False, eps=cfg.eps, name="head_norm")(h)
        hn = (hn.astype(jnp.float32) * (1 + em[:, 1:2]) + em[:, 0:1]).astype(h.dtype)
        out = nn.Dense(
            pf * ph * pw * cfg.out_dim, dtype=cfg.dtype, name="head"
        )(hn)

        # unpatchify back to [B, F*pf, H*ph, W*pw, out_dim]
        out = out.reshape(b, f, gh, gw, pf, ph, pw, cfg.out_dim)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        out = out.reshape(b, f * pf, gh * ph, gw * pw, cfg.out_dim)
        if capture:
            return out, {
                "attn_out": [a for a, _ in caps],
                "block_out": [x_ for _, x_ in caps],
            }
        return out

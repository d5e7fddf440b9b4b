"""MHLA Vision Transformer (DeiT-style image classifier).

Re-design of the reference ViT harness (``mhla_image_classification``):
``MHLA_ViT`` (``models/mhla_vit.py:9-97``) pads inputs to 256px (16x16
patches of 16), embeds patches, adds learned position embeddings (no class
token), rearranges tokens into ``piece_size x piece_size`` blocks, and runs
timm-style pre-norm blocks whose attention is swapped per variant
(``models/timm_registers.py:31-244``): MHLA blockwise / global linear /
softmax. Pooling is mean-over-tokens, then the classifier head.

Registry names mirror the reference's timm names:
deit_{tiny,small,base}_{mhla,linear,softmax}.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import MHLA2D, LinearAttention2D, MLP, sdpa
from ..layers.norms import LayerNorm, RMSNorm


@dataclasses.dataclass
class ViTConfig:
    img_size: int = 256
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    piece_size: int = 4  # blocks of piece_size x piece_size patches
    attn_type: str = "mhla"  # mhla | linear | softmax
    transform: str = "linear"
    exp_sigma: float = 3.0
    local_thres: float = 1.5
    qk_norm: bool = True
    qkv_bias: bool = True
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size  # patches per side

    @property
    def blocks_per_side(self) -> int:
        return self.grid // self.piece_size


class _SoftmaxAttn(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool
    qk_norm: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, t, _ = x.shape
        h, d = self.num_heads, self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = (z.reshape(b, t, h, d) for z in jnp.split(qkv, 3, axis=-1))
        if self.qk_norm:
            q = RMSNorm(name="q_norm")(q)
            k = RMSNorm(name="k_norm")(k)
        o = sdpa(q, k, v, causal=False).reshape(b, t, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(o)


class ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        h = LayerNorm(name="norm1")(x)
        if cfg.attn_type == "mhla":
            attn = MHLA2D(
                dim=cfg.embed_dim,
                num_heads=cfg.num_heads,
                blocks_per_side=cfg.blocks_per_side,
                block_len=cfg.piece_size,
                transform=cfg.transform,
                exp_sigma=cfg.exp_sigma,
                local_thres=cfg.local_thres,
                qk_norm=cfg.qk_norm,
                qkv_bias=cfg.qkv_bias,
                lepe_kernel=5,
                dtype=cfg.dtype,
                name="attn",
            )
            h = attn(h, deterministic=deterministic)
        elif cfg.attn_type == "linear":
            b, n, c, d = h.shape
            h = LinearAttention2D(
                dim=cfg.embed_dim, num_heads=cfg.num_heads, dtype=cfg.dtype,
                name="attn",
            )(h.reshape(b, n * c, d)).reshape(b, n, c, d)
        else:  # softmax
            b, n, c, d = h.shape
            h = _SoftmaxAttn(
                dim=cfg.embed_dim, num_heads=cfg.num_heads,
                qkv_bias=cfg.qkv_bias, qk_norm=cfg.qk_norm, dtype=cfg.dtype,
                name="attn",
            )(h.reshape(b, n * c, d)).reshape(b, n, c, d)
        x = x + h

        h = LayerNorm(name="norm2")(x)
        h = MLP(
            hidden_features=int(cfg.embed_dim * cfg.mlp_ratio),
            activation="gelu",
            dtype=cfg.dtype,
            name="mlp",
        )(h)
        return x + h


class MHLAViT(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jax.Array, deterministic: bool = True) -> jax.Array:
        """images: [B, H, W, 3] (NHWC); pads to img_size like the reference
        ``pad_to_16x16_patches`` (``mhla_vit.py:49-57``)."""
        cfg = self.cfg
        b = images.shape[0]
        ph = cfg.img_size - images.shape[1]
        pw = cfg.img_size - images.shape[2]
        if ph or pw:
            images = jnp.pad(
                images,
                ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
            )

        x = nn.Conv(
            cfg.embed_dim,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            dtype=cfg.dtype,
            name="patch_embed",
        )(images)
        g = cfg.grid
        x = x.reshape(b, g * g, cfg.embed_dim)
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, g * g, cfg.embed_dim),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)

        # block-major rearrange (``mhla_vit.py:21-47``)
        p, nb = cfg.piece_size, cfg.blocks_per_side
        x = (
            x.reshape(b, nb, p, nb, p, cfg.embed_dim)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, nb * nb, p * p, cfg.embed_dim)
        )

        for i in range(cfg.depth):
            x = ViTBlock(cfg, name=f"blocks_{i}")(x, deterministic)

        x = LayerNorm(name="norm")(x)
        x = x.reshape(b, -1, cfg.embed_dim).mean(axis=1)  # global average pool
        return nn.Dense(cfg.num_classes, dtype=jnp.float32, name="head")(x)


VIT_SIZES = {
    "tiny": dict(embed_dim=192, num_heads=3),
    "small": dict(embed_dim=384, num_heads=6),
    "base": dict(embed_dim=768, num_heads=12),
}


def build_vit(name: str, **overrides) -> Tuple[MHLAViT, ViTConfig]:
    """deit_{tiny,small,base}_{mhla,linear,softmax} factory."""
    parts = name.split("_")
    assert parts[0] == "deit" and len(parts) >= 3, name
    size, attn = parts[1], parts[2]
    cfg = ViTConfig(attn_type=attn, **VIT_SIZES[size], **overrides)
    return MHLAViT(cfg), cfg

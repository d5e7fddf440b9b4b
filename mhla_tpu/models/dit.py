"""DiT with MHLA attention (class-conditional latent diffusion backbone).

Re-design of ``mhla_dit/models.py``: adaLN-Zero DiT blocks whose attention is
``MHLA4DiT`` (here :class:`~mhla_tpu.layers.MHLA2D` with trainable clamped
mixing + 3x3 LePE), block-major piecewise patch ordering applied after the
patch embed and inverted before unpatchify (``models.py:377,387-392``,
``piecewise_patchembed.py``), frozen 2D sin-cos position embeddings, and
CFG that guides only the first ``in_channels`` output channels
(``forward_with_cfg``, ``models.py:396-412``).

Reference init scheme carried over (``initialize_weights``, ``models.py:300-350``):
xavier-uniform linears, zeroed adaLN modulations and final layer, identity
depthwise (LePE) convs, normal(0.02) label/timestep embeddings.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import MHLA2D, MLP
from ..layers.norms import LayerNorm


def timestep_embedding(t: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
    """Sinusoidal timestep embedding (GLIDE convention: cos first)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def sincos_pos_embed_2d(dim: int, grid: int) -> np.ndarray:
    """Standard 2D sin-cos position embedding [grid*grid, dim]."""
    def one_dim(d, pos):
        omega = 1.0 / 10000 ** (np.arange(d // 2, dtype=np.float64) / (d / 2))
        out = np.einsum("m,d->md", pos.ravel(), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gy, gx = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
    return np.concatenate(
        [one_dim(dim // 2, gx), one_dim(dim // 2, gy)], axis=1
    ).astype(np.float32)


class TimestepEmbedder(nn.Module):
    hidden_size: int
    freq_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        init = nn.initializers.normal(0.02)
        h = timestep_embedding(t, self.freq_size)
        h = nn.Dense(self.hidden_size, kernel_init=init, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.silu(h)
        return nn.Dense(self.hidden_size, kernel_init=init, dtype=self.dtype, name="fc2")(h)


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG dropout to the null class."""

    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        labels: jax.Array,
        train: bool = False,
        force_drop: Optional[jax.Array] = None,
    ) -> jax.Array:
        use_cfg = self.dropout_prob > 0
        table = nn.Embed(
            self.num_classes + int(use_cfg),
            self.hidden_size,
            embedding_init=nn.initializers.normal(0.02),
            dtype=self.dtype,
            name="table",
        )
        if force_drop is not None:
            labels = jnp.where(force_drop, self.num_classes, labels)
        elif train and use_cfg:
            rng = self.make_rng("label_dropout")
            drop = jax.random.uniform(rng, labels.shape) < self.dropout_prob
            labels = jnp.where(drop, self.num_classes, labels)
        return table(labels)


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    return x * (1 + scale[:, None]) + shift[:, None]


def _identity_depthwise_init(key, shape, dtype=jnp.float32):
    """LePE conv starts as the identity (reference ``_basic_init``:
    Conv2d kernels >= 3 are zeroed with a 1 at the center)."""
    kh, kw = shape[0], shape[1]
    w = jnp.zeros(shape, dtype)
    return w.at[kh // 2, kw // 2, :, :].set(1.0)


class DiTBlockMHLA(nn.Module):
    hidden_size: int
    num_heads: int
    blocks_per_side: int
    block_len: int
    mlp_ratio: float = 4.0
    transform: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        """x: [B, N_blocks, C_block, D] (block-major); c: [B, D]."""
        mod = nn.Dense(
            6 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="adaLN_modulation",
        )(jax.nn.silu(c))
        s_msa, g_msa = mod[:, : self.hidden_size], mod[:, 2 * self.hidden_size : 3 * self.hidden_size]
        sc_msa = mod[:, self.hidden_size : 2 * self.hidden_size]
        s_mlp = mod[:, 3 * self.hidden_size : 4 * self.hidden_size]
        sc_mlp = mod[:, 4 * self.hidden_size : 5 * self.hidden_size]
        g_mlp = mod[:, 5 * self.hidden_size :]

        b, n, cb, d = x.shape

        def mod4(h, shift, scale):
            return (h * (1 + scale[:, None, None]) + shift[:, None, None]).astype(x.dtype)

        h = LayerNorm(use_bias=False, use_scale=False, name="norm1")(x)
        h = mod4(h, s_msa, sc_msa)
        h = MHLA2D(
            dim=self.hidden_size,
            num_heads=self.num_heads,
            blocks_per_side=self.blocks_per_side,
            block_len=self.block_len,
            transform=self.transform,
            trainable_mixing=True,
            qkv_bias=True,
            lepe_kernel=3,
            use_input_norm=True,
            dtype=self.dtype,
            name="attn",
        )(h)
        x = x + g_msa[:, None, None] * h

        h = LayerNorm(use_bias=False, use_scale=False, name="norm2")(x)
        h = mod4(h, s_mlp, sc_mlp)
        h = MLP(
            hidden_features=int(self.hidden_size * self.mlp_ratio),
            activation="gelu",
            dtype=self.dtype,
            name="mlp",
        )(h)
        return x + g_mlp[:, None, None] * h


@dataclasses.dataclass
class DiTConfig:
    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = True
    block_size: int = 16  # tokens per block (piece_size**2)
    transform: str = "linear"
    dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.input_size // self.patch_size

    @property
    def piece_size(self) -> int:
        return int(math.isqrt(self.block_size))

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels


class DiT(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, H, W, C] latents (NHWC)
        t: jax.Array,  # [B]
        y: jax.Array,  # [B] int labels
        train: bool = False,
        force_drop: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        b = x.shape[0]
        g, p = cfg.grid, cfg.patch_size

        h = nn.Conv(
            cfg.hidden_size,
            (p, p),
            strides=(p, p),
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=cfg.dtype,
            name="x_embedder",
        )(x)
        h = h.reshape(b, g * g, cfg.hidden_size)
        pos = jnp.asarray(sincos_pos_embed_2d(cfg.hidden_size, g))[None]
        h = h + pos.astype(h.dtype)

        # block-major piecewise ordering, kept as [B, N, C, D] through blocks
        ps, nb = cfg.piece_size, g // cfg.piece_size
        h = (
            h.reshape(b, nb, ps, nb, ps, cfg.hidden_size)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, nb * nb, ps * ps, cfg.hidden_size)
        )

        t_emb = TimestepEmbedder(cfg.hidden_size, dtype=cfg.dtype, name="t_embedder")(t)
        y_emb = LabelEmbedder(
            cfg.num_classes, cfg.hidden_size, cfg.class_dropout_prob,
            dtype=cfg.dtype, name="y_embedder",
        )(y, train=train, force_drop=force_drop)
        c = t_emb + y_emb

        for i in range(cfg.depth):
            h = DiTBlockMHLA(
                hidden_size=cfg.hidden_size,
                num_heads=cfg.num_heads,
                blocks_per_side=nb,
                block_len=ps,
                mlp_ratio=cfg.mlp_ratio,
                transform=cfg.transform,
                dtype=cfg.dtype,
                name=f"blocks_{i}",
            )(h, c)

        # final layer (adaLN + zero-init linear)
        mod = nn.Dense(
            2 * cfg.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=cfg.dtype,
            name="final_adaLN",
        )(jax.nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = LayerNorm(use_bias=False, use_scale=False, name="norm_final")(h)
        h = h * (1 + scale[:, None, None]) + shift[:, None, None]
        h = nn.Dense(
            p * p * cfg.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=cfg.dtype,
            name="final_linear",
        )(h)

        # invert piecewise ordering, then unpatchify to NHWC
        h = (
            h.reshape(b, nb, nb, ps, ps, -1)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, g * g, -1)
        )
        h = h.reshape(b, g, g, p, p, cfg.out_channels)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, g * p, g * p, cfg.out_channels
        )
        return h

    def forward_with_cfg(
        self, variables, x, t, y, cfg_scale: float
    ) -> jax.Array:
        """CFG on the first in_channels (eps) only (``models.py:396-412``).
        x is the doubled batch [cond; uncond-copy] in NHWC."""
        cfg = self.cfg
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        out = self.apply(variables, combined, t, y)
        eps, rest = out[..., : cfg.in_channels], out[..., cfg.in_channels :]
        cond, uncond = jnp.split(eps, 2, axis=0)
        guided = uncond + cfg_scale * (cond - uncond)
        eps = jnp.concatenate([guided, guided], axis=0)
        return jnp.concatenate([eps, rest], axis=-1)


_DIT_SIZES = {
    "XL": dict(depth=28, hidden_size=1152, num_heads=16),
    "L": dict(depth=24, hidden_size=1024, num_heads=16),
    "L-half": dict(depth=12, hidden_size=1024, num_heads=16),
    "L-half-small-head": dict(depth=12, hidden_size=1024, num_heads=8),
    "B": dict(depth=12, hidden_size=768, num_heads=12),
    "S": dict(depth=12, hidden_size=384, num_heads=6),
}


def build_dit(name: str, **overrides) -> Tuple[DiT, DiTConfig]:
    """'DiT-S/2'-style names, matching the reference ``DiT_models`` dict."""
    body = name[len("DiT-"):]
    size, patch = body.rsplit("/", 1)
    kwargs = {"patch_size": int(patch), **_DIT_SIZES[size]}
    kwargs.update(overrides)  # explicit overrides beat the size preset
    cfg = DiTConfig(**kwargs)
    return DiT(cfg), cfg


DiT_models = [f"DiT-{s}/{p}" for s in _DIT_SIZES for p in (2, 4, 8)]

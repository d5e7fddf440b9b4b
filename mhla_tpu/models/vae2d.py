"""2D image VAE (Stable-Diffusion AutoencoderKL) for DiT feature extraction.

TPU re-design of the VAE the reference loads through diffusers
(``mhla_dit/extract_features.py:203-211``: ``vae.encode(x).latent_dist
.sample().mul_(0.18215)``; ``mhla_dit/sample.py:65``: ``vae.decode(z /
0.18215)``). Architecture matches ``AutoencoderKL`` ("stabilityai/sd-vae-
ft-ema"): f8 downsampling, 4 latent channels, GroupNorm(32) + SiLU resnet
blocks, a single-head spatial attention mid-block, asymmetric-pad strided
downsampling and nearest-neighbor upsampling.

Layout is NHWC throughout (TPU-native); the checkpoint converter
(:func:`convert_sd_vae_checkpoint`) maps a diffusers-format torch state
dict (NCHW conv kernels) onto this module.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SD_VAE_SCALE = 0.18215


class GroupNorm32(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.GroupNorm(num_groups=32, epsilon=self.eps, name="norm")(x)


class ResnetBlock2D(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x
        if x.shape[-1] != self.out_dim:
            h = nn.Conv(self.out_dim, (1, 1), name="conv_shortcut")(x)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(x)
        y = nn.Conv(self.out_dim, (3, 3), padding="SAME", name="conv1")(
            jax.nn.silu(y)
        )
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2")(y)
        y = nn.Conv(self.out_dim, (3, 3), padding="SAME", name="conv2")(
            jax.nn.silu(y)
        )
        return y + h


class AttnBlock2D(nn.Module):
    """Single-head full spatial attention (SD-VAE mid-block)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(y)
        k = nn.Dense(c, name="to_k")(y)
        v = nn.Dense(c, name="to_v")(y)
        attn = jax.nn.softmax(
            jnp.einsum("bic,bjc->bij", q, k).astype(jnp.float32) * c**-0.5, -1
        ).astype(v.dtype)
        y = jnp.einsum("bij,bjc->bic", attn, v)
        y = nn.Dense(c, name="to_out")(y)
        return x + y.reshape(b, h, w, c)


class Downsample2D(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # SD-VAE pads (0,1,0,1): bottom/right only, then stride-2 VALID
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.dim, (3, 3), strides=(2, 2), padding="VALID", name="conv"
        )(x)


class Upsample2D(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
        return nn.Conv(self.dim, (3, 3), padding="SAME", name="conv")(x)


@dataclasses.dataclass(frozen=True)
class VAE2DConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = SD_VAE_SCALE


class Encoder2D(nn.Module):
    cfg: VAE2DConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        chans = cfg.block_out_channels
        h = nn.Conv(chans[0], (3, 3), padding="SAME", name="conv_in")(x)
        for i, c in enumerate(chans):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(c, name=f"down_{i}_res_{j}")(h)
            if i < len(chans) - 1:
                h = Downsample2D(c, name=f"down_{i}_downsample")(h)
        h = ResnetBlock2D(chans[-1], name="mid_res_0")(h)
        h = AttnBlock2D(name="mid_attn")(h)
        h = ResnetBlock2D(chans[-1], name="mid_res_1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="conv_norm_out")(h)
        return nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding="SAME", name="conv_out"
        )(jax.nn.silu(h))


class Decoder2D(nn.Module):
    cfg: VAE2DConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.cfg
        chans = tuple(reversed(cfg.block_out_channels))
        h = nn.Conv(chans[0], (3, 3), padding="SAME", name="conv_in")(z)
        h = ResnetBlock2D(chans[0], name="mid_res_0")(h)
        h = AttnBlock2D(name="mid_attn")(h)
        h = ResnetBlock2D(chans[0], name="mid_res_1")(h)
        for i, c in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):  # decoder: 3 per block
                h = ResnetBlock2D(c, name=f"up_{i}_res_{j}")(h)
            if i < len(chans) - 1:
                h = Upsample2D(c, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="conv_norm_out")(h)
        return nn.Conv(
            cfg.in_channels, (3, 3), padding="SAME", name="conv_out"
        )(jax.nn.silu(h))


class VAE2D(nn.Module):
    """AutoencoderKL: images [B, H, W, 3] in [-1, 1] <-> latents
    [B, H/8, W/8, 4] (already multiplied by the 0.18215 scaling factor)."""

    cfg: VAE2DConfig = VAE2DConfig()

    def setup(self):
        self.encoder = Encoder2D(self.cfg, name="encoder")
        self.decoder = Decoder2D(self.cfg, name="decoder")
        self.quant_conv = nn.Conv(
            2 * self.cfg.latent_channels, (1, 1), name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.cfg.latent_channels, (1, 1), name="post_quant_conv"
        )

    def moments(self, images: jax.Array) -> Tuple[jax.Array, jax.Array]:
        h = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(
        self, images: jax.Array, rng: Optional[jax.Array] = None
    ) -> jax.Array:
        """Sample (or take the mean when rng is None) and scale."""
        mean, logvar = self.moments(images)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype
            )
        return mean * self.cfg.scaling_factor

    def decode(self, z: jax.Array) -> jax.Array:
        z = z / self.cfg.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, images: jax.Array) -> jax.Array:
        return self.decode(self.encode(images))


# ---------------------------------------------------------------------------
# diffusers checkpoint conversion
# ---------------------------------------------------------------------------


def _conv(sd: Dict[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    # torch conv [out, in, kh, kw] -> flax [kh, kw, in, out]
    return {
        "kernel": np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0),
        "bias": np.asarray(sd[f"{key}.bias"]),
    }


def _lin(sd: Dict[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": np.asarray(sd[f"{key}.weight"]).T,
        "bias": np.asarray(sd[f"{key}.bias"]),
    }


def _gn(sd: Dict[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[f"{key}.weight"]),
        "bias": np.asarray(sd[f"{key}.bias"]),
    }


def _resnet(sd, prefix) -> Dict[str, Any]:
    out = {
        "norm1": _gn(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "norm2": _gn(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{prefix}.conv_shortcut")
    return out


def _attn(sd, prefix) -> Dict[str, Any]:
    def lin_or_conv(key):
        w = np.asarray(sd[f"{key}.weight"])
        if w.ndim == 4:  # older checkpoints use 1x1 convs
            w = w[:, :, 0, 0]
        return {"kernel": w.T, "bias": np.asarray(sd[f"{key}.bias"])}

    names = {"q": "to_q", "k": "to_k", "v": "to_v"}
    # diffusers >=0.15 uses to_q/..., older uses query/key/value/proj_attn
    if f"{prefix}.query.weight" in sd:
        names = {"q": "query", "k": "key", "v": "value"}
        out_name = f"{prefix}.proj_attn"
    else:
        out_name = f"{prefix}.to_out.0"
    return {
        "group_norm": _gn(sd, f"{prefix}.group_norm"),
        "to_q": lin_or_conv(f"{prefix}.{names['q']}"),
        "to_k": lin_or_conv(f"{prefix}.{names['k']}"),
        "to_v": lin_or_conv(f"{prefix}.{names['v']}"),
        "to_out": lin_or_conv(out_name),
    }


def convert_sd_vae_checkpoint(
    sd: Dict[str, np.ndarray], cfg: VAE2DConfig = VAE2DConfig()
) -> Dict[str, Any]:
    """diffusers AutoencoderKL state dict -> VAE2D flax params."""
    n_blocks = len(cfg.block_out_channels)
    enc: Dict[str, Any] = {"conv_in": _conv(sd, "encoder.conv_in")}
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block):
            enc[f"down_{i}_res_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}"
            )
        if i < n_blocks - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
            }
    enc["mid_res_0"] = _resnet(sd, "encoder.mid_block.resnets.0")
    enc["mid_res_1"] = _resnet(sd, "encoder.mid_block.resnets.1")
    enc["mid_attn"] = _attn(sd, "encoder.mid_block.attentions.0")
    enc["conv_norm_out"] = _gn(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": _conv(sd, "decoder.conv_in")}
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}"
            )
        if i < n_blocks - 1:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
            }
    dec["mid_res_0"] = _resnet(sd, "decoder.mid_block.resnets.0")
    dec["mid_res_1"] = _resnet(sd, "decoder.mid_block.resnets.1")
    dec["mid_attn"] = _attn(sd, "decoder.mid_block.attentions.0")
    dec["conv_norm_out"] = _gn(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    params = {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": {
            "kernel": np.asarray(sd["quant_conv.weight"]).transpose(2, 3, 1, 0),
            "bias": np.asarray(sd["quant_conv.bias"]),
        },
        "post_quant_conv": {
            "kernel": np.asarray(sd["post_quant_conv.weight"]).transpose(
                2, 3, 1, 0
            ),
            "bias": np.asarray(sd["post_quant_conv.bias"]),
        },
    }
    return {"params": jax.tree.map(jnp.asarray, params)}

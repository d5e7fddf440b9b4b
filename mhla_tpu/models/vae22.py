"""Wan2.2 3D causal video VAE (the higher-compression 48-channel variant).

Flax re-design of the reference ``Wan2_2_VAE``
(``mhla_videogen/diffusion/model/wan2_2/vae.py``). Structural differences
from the Wan2.1 VAE (``models/vae.py``, whose CausalConv3d / ChannelRMSNorm
/ ResidualBlock / AttentionBlock / Resample modules are reused here):

- pixel inputs are 2x2 space-to-depth patchified (3 -> 12 channels) before
  the encoder, and the decoder emits 12 channels that unpatchify back
  (reference ``vae.py:258-289``);
- every stage is a residual-over-stage block: the main path (res blocks +
  resample) is summed with a parameter-free space/time-to-depth AVERAGE
  shortcut on the way down (``AvgDown3D``, ``vae.py:292-343``) and a
  depth-to-space DUPLICATE shortcut on the way up (``DupUp3D``,
  ``vae.py:345-387``);
- z_dim 48, encoder dim 160, decoder dim 256, temporal downsampling at
  stages (False, True, True).

Temporal semantics follow the same single-shot streaming-equivalence as
the 2.1 module (causal convs over the full sequence; the decoder's DupUp
shortcut drops its first ``factor_t - 1`` duplicated frames, which is the
single-shot form of the reference's ``first_chunk`` trim).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .vae import (
    AttentionBlock,
    CausalConv3d,
    ChannelRMSNorm,
    Resample,
    ResidualBlock,
    _conv_kernel,
)

# published Wan2.2 per-channel latent stats (reference ``vae.py:858-965``)
WAN22_LATENT_MEAN = [
    -0.2289, -0.0052, -0.1323, -0.2339, -0.2799, 0.0174, 0.1838, 0.1557,
    -0.1382, 0.0542, 0.2813, 0.0891, 0.1570, -0.0098, 0.0375, -0.1825,
    -0.2246, -0.1207, -0.0698, 0.5109, 0.2665, -0.2108, -0.2158, 0.2502,
    -0.2055, -0.0322, 0.1109, 0.1567, -0.0729, 0.0899, -0.2799, -0.1230,
    -0.0313, -0.1649, 0.0117, 0.0723, -0.2839, -0.2083, -0.0520, 0.3748,
    0.0152, 0.1957, 0.1433, -0.2944, 0.3573, -0.0548, -0.1681, -0.0667,
]
WAN22_LATENT_STD = [
    0.4765, 1.0364, 0.4514, 1.1677, 0.5313, 0.4990, 0.4818, 0.5013,
    0.8158, 1.0344, 0.5894, 1.0901, 0.6885, 0.6165, 0.8454, 0.4978,
    0.5759, 0.3523, 0.7135, 0.6804, 0.5833, 1.4146, 0.8986, 0.5659,
    0.7069, 0.5338, 0.4889, 0.4917, 0.4069, 0.4999, 0.6866, 0.4093,
    0.5709, 0.6065, 0.6415, 0.4944, 0.5726, 1.2042, 0.5458, 1.6887,
    0.3971, 1.0600, 0.3943, 0.5537, 0.5444, 0.4089, 0.7468, 0.7744,
]


def patchify2(x: jax.Array) -> jax.Array:
    """[B, T, H, W, C] -> [B, T, H/2, W/2, 4C]; channel order (c, r, q)
    with q the H sub-pixel and r the W sub-pixel (reference rearrange
    ``b c f (h q) (w r) -> b (c r q) f h w``)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // 2, 2, w // 2, 2, c)  # [.., hq, q, wq, r, c]
    x = x.transpose(0, 1, 2, 4, 6, 5, 3)  # [.., h', w', c, r, q]
    return x.reshape(b, t, h // 2, w // 2, 4 * c)


def unpatchify2(x: jax.Array) -> jax.Array:
    b, t, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, t, h, w, c, 2, 2)  # [.., c, r, q]
    x = x.transpose(0, 1, 2, 6, 3, 5, 4)  # [.., h, q, w, r, c]
    return x.reshape(b, t, 2 * h, 2 * w, c)


def avg_down3d(x: jax.Array, out_ch: int, factor_t: int, factor_s: int) -> jax.Array:
    """Parameter-free space/time-to-depth group-average downsample
    (reference ``AvgDown3D.forward``; T is padded on the LEFT)."""
    b, t, h, w, c = x.shape
    pad_t = (-t) % factor_t
    if pad_t:
        x = jnp.pad(x, ((0, 0), (pad_t, 0), (0, 0), (0, 0), (0, 0)))
        t += pad_t
    factor = factor_t * factor_s * factor_s
    x = x.reshape(
        b, t // factor_t, factor_t, h // factor_s, factor_s,
        w // factor_s, factor_s, c,
    )
    # channel order (c, it, ih, iw) — matches the torch permute
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    x = x.reshape(b, t // factor_t, h // factor_s, w // factor_s, c * factor)
    group = c * factor // out_ch
    x = x.reshape(*x.shape[:-1], out_ch, group)
    return x.mean(axis=-1)


def dup_up3d(
    x: jax.Array, out_ch: int, factor_t: int, factor_s: int, first_chunk: bool
) -> jax.Array:
    """Parameter-free depth-to-space duplicate upsample (reference
    ``DupUp3D.forward``); ``first_chunk`` trims the leading factor_t - 1
    duplicated frames (single-shot causal form)."""
    b, t, h, w, c = x.shape
    factor = factor_t * factor_s * factor_s
    repeats = out_ch * factor // c
    x = jnp.repeat(x, repeats, axis=-1)
    x = x.reshape(b, t, h, w, out_ch, factor_t, factor_s, factor_s)
    # [.., T, it, H, ih, W, iw, out]
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    x = x.reshape(b, t * factor_t, h * factor_s, w * factor_s, out_ch)
    if first_chunk and factor_t > 1:
        x = x[:, factor_t - 1 :]
    return x


@dataclasses.dataclass(frozen=True)
class VAE22Config:
    dim: int = 160
    dec_dim: int = 256
    z_dim: int = 48
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)


class DownStage(nn.Module):
    """Reference ``Down_ResidualBlock``: res blocks (+ resample) summed
    with the AvgDown3D shortcut."""

    out_dim: int
    mult: int
    temporal: bool
    down_flag: bool

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        shortcut = avg_down3d(
            x,
            self.out_dim,
            factor_t=2 if self.temporal else 1,
            factor_s=2 if self.down_flag else 1,
        )
        y = x
        for j in range(self.mult):
            y = ResidualBlock(self.out_dim, name=f"res_{j}")(y)
        if self.down_flag:
            mode = "downsample3d" if self.temporal else "downsample2d"
            y = Resample(self.out_dim, mode, name="resample")(y)
        return y + shortcut


class UpStage(nn.Module):
    """Reference ``Up_ResidualBlock``: res blocks (+ resample) summed with
    the DupUp3D shortcut (identity when the stage does not upsample)."""

    out_dim: int
    mult: int
    temporal: bool
    up_flag: bool

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = x
        for j in range(self.mult):
            y = ResidualBlock(self.out_dim, name=f"res_{j}")(y)
        if self.up_flag:
            mode = "upsample3d" if self.temporal else "upsample2d"
            y = Resample(
                self.out_dim, mode, up_features=self.out_dim, name="resample"
            )(y)
            shortcut = dup_up3d(
                x,
                self.out_dim,
                factor_t=2 if self.temporal else 1,
                factor_s=2,
                first_chunk=True,
            )
            return y + shortcut
        return y


class Encoder22(nn.Module):
    cfg: VAE22Config

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
        x = CausalConv3d(dims[0], name="conv1")(x)
        for i, out_dim in enumerate(dims[1:]):
            x = DownStage(
                out_dim,
                mult=cfg.num_res_blocks,
                temporal=(
                    cfg.temporal_downsample[i]
                    if i < len(cfg.temporal_downsample)
                    else False
                ),
                down_flag=i != len(cfg.dim_mult) - 1,
                name=f"down_{i}",
            )(x)
        x = ResidualBlock(dims[-1], name="middle_0")(x)
        x = AttentionBlock(name="middle_1")(x)
        x = ResidualBlock(dims[-1], name="middle_2")(x)
        x = ChannelRMSNorm(name="head_norm")(x)
        return CausalConv3d(cfg.z_dim * 2, name="head_conv")(jax.nn.silu(x))


class Decoder22(nn.Module):
    cfg: VAE22Config

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.cfg
        mult = tuple(cfg.dim_mult)
        dims = [cfg.dec_dim * u for u in (mult[-1],) + mult[::-1]]
        temporal_up = tuple(cfg.temporal_downsample)[::-1]
        x = CausalConv3d(dims[0], name="conv1")(z)
        x = ResidualBlock(dims[0], name="middle_0")(x)
        x = AttentionBlock(name="middle_1")(x)
        x = ResidualBlock(dims[0], name="middle_2")(x)
        for i, out_dim in enumerate(dims[1:]):
            x = UpStage(
                out_dim,
                mult=cfg.num_res_blocks + 1,
                temporal=temporal_up[i] if i < len(temporal_up) else False,
                up_flag=i != len(mult) - 1,
                name=f"up_{i}",
            )(x)
        x = ChannelRMSNorm(name="head_norm")(x)
        return CausalConv3d(12, name="head_conv")(jax.nn.silu(x))


class Wan22VAE(nn.Module):
    """Encode/decode wrapper: 2x2 patchify, 48-channel normalized latents
    (deterministic: returns the normalized mean, like the 2.1 wrapper)."""

    cfg: VAE22Config = VAE22Config()

    def setup(self):
        self.encoder = Encoder22(self.cfg, name="encoder")
        self.decoder = Decoder22(self.cfg, name="decoder")
        self.conv1 = CausalConv3d(self.cfg.z_dim * 2, (1, 1, 1), name="conv1")
        self.conv2 = CausalConv3d(self.cfg.z_dim, (1, 1, 1), name="conv2")

    def encode(self, video: jax.Array) -> jax.Array:
        """video [B, T, H, W, 3] in [-1, 1] -> normalized latents
        [B, 1+(T-1)/4, H/16, W/16, 48]."""
        x = patchify2(video)
        out = self.conv1(self.encoder(x))
        mu = out[..., : self.cfg.z_dim]
        mean = jnp.asarray(WAN22_LATENT_MEAN[: self.cfg.z_dim])
        std = jnp.asarray(WAN22_LATENT_STD[: self.cfg.z_dim])
        return (mu - mean) / std

    def decode(self, z: jax.Array) -> jax.Array:
        mean = jnp.asarray(WAN22_LATENT_MEAN[: self.cfg.z_dim])
        std = jnp.asarray(WAN22_LATENT_STD[: self.cfg.z_dim])
        z = z * std + mean
        x = self.decoder(self.conv2(z))
        return jnp.clip(unpatchify2(x), -1.0, 1.0)

    def __call__(self, video: jax.Array) -> jax.Array:
        return self.decode(self.encode(video))


def convert_vae22_checkpoint(
    state: Dict[str, np.ndarray], cfg: VAE22Config = VAE22Config()
) -> Dict:
    """Reference Wan2.2 torch state-dict -> flax params for
    :class:`Wan22VAE`. Residual/attention/resample inner naming matches
    the 2.1 layout (``vae.py:178-258``); stages nest one level deeper
    (``downsamples.{i}.downsamples.{j}`` / ``upsamples.{i}.upsamples.{j}``;
    the Avg/Dup shortcuts are parameter-free)."""

    def conv(prefix):
        out = {"conv": {"kernel": _conv_kernel(state[prefix + ".weight"])}}
        if prefix + ".bias" in state:
            out["conv"]["bias"] = np.asarray(state[prefix + ".bias"])
        return out

    def norm(prefix):
        return {"gamma": np.asarray(state[prefix + ".gamma"]).reshape(-1)}

    def res_block(prefix, has_shortcut):
        blk = {
            "norm1": norm(prefix + ".residual.0"),
            "conv1": conv(prefix + ".residual.2"),
            "norm2": norm(prefix + ".residual.3"),
            "conv2": conv(prefix + ".residual.6"),
        }
        if has_shortcut:
            blk["shortcut"] = conv(prefix + ".shortcut")
        return blk

    def attn_block(prefix):
        qkv_w = np.asarray(state[prefix + ".to_qkv.weight"])[..., 0, 0]
        proj_w = np.asarray(state[prefix + ".proj.weight"])[..., 0, 0]
        return {
            "norm": norm(prefix + ".norm"),
            "to_qkv": {
                "kernel": qkv_w.T,
                "bias": np.asarray(state[prefix + ".to_qkv.bias"]),
            },
            "proj": {
                "kernel": proj_w.T,
                "bias": np.asarray(state[prefix + ".proj.bias"]),
            },
        }

    def resample(prefix, mode):
        out = {"conv": conv(prefix + ".resample.1")["conv"]}
        if mode.endswith("3d"):
            out["time_conv"] = conv(prefix + ".time_conv")["conv"]
        return out

    mult = tuple(cfg.dim_mult)
    params: Dict[str, Any] = {
        "conv1": conv("conv1"),
        "conv2": conv("conv2"),
    }

    # encoder
    enc: Dict[str, Any] = {"conv1": conv("encoder.conv1")}
    dims = [cfg.dim * u for u in (1,) + mult]
    for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
        down_flag = i != len(mult) - 1
        temporal = (
            cfg.temporal_downsample[i]
            if i < len(cfg.temporal_downsample)
            else False
        )
        stage: Dict[str, Any] = {}
        cur = in_dim
        for j in range(cfg.num_res_blocks):
            stage[f"res_{j}"] = res_block(
                f"encoder.downsamples.{i}.downsamples.{j}", cur != out_dim
            )
            cur = out_dim
        if down_flag:
            mode = "downsample3d" if temporal else "downsample2d"
            stage["resample"] = resample(
                f"encoder.downsamples.{i}.downsamples.{cfg.num_res_blocks}",
                mode,
            )
        enc[f"down_{i}"] = stage
    enc["middle_0"] = res_block("encoder.middle.0", False)
    enc["middle_1"] = attn_block("encoder.middle.1")
    enc["middle_2"] = res_block("encoder.middle.2", False)
    enc["head_norm"] = norm("encoder.head.0")
    enc["head_conv"] = conv("encoder.head.2")
    params["encoder"] = enc

    # decoder
    dec: Dict[str, Any] = {"conv1": conv("decoder.conv1")}
    ddims = [cfg.dec_dim * u for u in (mult[-1],) + mult[::-1]]
    temporal_up = tuple(cfg.temporal_downsample)[::-1]
    for i, (in_dim, out_dim) in enumerate(zip(ddims[:-1], ddims[1:])):
        up_flag = i != len(mult) - 1
        temporal = temporal_up[i] if i < len(temporal_up) else False
        stage = {}
        cur = in_dim
        for j in range(cfg.num_res_blocks + 1):
            stage[f"res_{j}"] = res_block(
                f"decoder.upsamples.{i}.upsamples.{j}", cur != out_dim
            )
            cur = out_dim
        if up_flag:
            mode = "upsample3d" if temporal else "upsample2d"
            stage["resample"] = resample(
                f"decoder.upsamples.{i}.upsamples.{cfg.num_res_blocks + 1}",
                mode,
            )
        dec[f"up_{i}"] = stage
    dec["middle_0"] = res_block("decoder.middle.0", False)
    dec["middle_1"] = attn_block("decoder.middle.1")
    dec["middle_2"] = res_block("decoder.middle.2", False)
    dec["head_norm"] = norm("decoder.head.0")
    dec["head_conv"] = conv("decoder.head.2")
    params["decoder"] = dec
    return {"params": params}

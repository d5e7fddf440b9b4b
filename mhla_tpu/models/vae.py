"""Wan2.1 3D causal video VAE (frozen encode/decode for the video pipeline).

Flax re-design of the reference ``WanVAE`` (``mhla_videogen/.../wan/vae.py``):
causal 3D convs (time padded left by 2), channel-L2 RMS norms, spatial
up/down resampling with temporal stride-2 convs at the 3D stages, per-frame
single-head attention at the bottleneck, and the published per-channel
latent mean/std normalization (``vae.py:590-625``).

Temporal semantics: the reference always runs its chunked streaming path
(1 + 4k frame chunks with a 2-frame cache). This module computes the exact
single-shot equivalent:

- causal convs == full-sequence causal conv (left-pad 2);
- ``downsample3d`` time path == frame 0 passthrough + VALID stride-2 conv
  over the full sequence (windows at 0, 2, 4, ...) — 1+4k -> 1+2k frames;
- ``upsample3d`` time path == frame 0 passthrough + zero-left-padded causal
  conv over frames 1.. with channel-doubling time interleave — T -> 1+2(T-1).

Layout is NDHWC ([B, T, H, W, C]); ``convert_vae_checkpoint`` loads the
reference torch weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

WAN_LATENT_MEAN = [
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
]
WAN_LATENT_STD = [
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
]


class CausalConv3d(nn.Module):
    """3D conv with causal (left) temporal padding, 'same' spatial padding."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    time_pad: Optional[int] = None  # default 2 * (kt // 2)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kt, kh, kw = self.kernel
        tp = self.time_pad if self.time_pad is not None else 2 * (kt // 2)
        x = jnp.pad(
            x,
            ((0, 0), (tp, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
        )
        return nn.Conv(
            self.features, self.kernel, strides=self.stride, padding="VALID",
            name="conv",
        )(x)


class ChannelRMSNorm(nn.Module):
    """L2-normalize the channel vector, scale by sqrt(dim) * gamma
    (reference ``RMS_norm``, ``vae.py:43-56``)."""

    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        g = self.param("gamma", nn.initializers.ones, (dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        n = xf * jax.lax.rsqrt(jnp.sum(xf * xf, -1, keepdims=True) + 1e-12)
        y = n * (dim**0.5) * g
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return y.astype(x.dtype)


class ResidualBlock(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x
        if x.shape[-1] != self.out_dim:
            h = CausalConv3d(self.out_dim, (1, 1, 1), name="shortcut")(x)
        y = ChannelRMSNorm(name="norm1")(x)
        y = CausalConv3d(self.out_dim, name="conv1")(jax.nn.silu(y))
        y = ChannelRMSNorm(name="norm2")(y)
        y = CausalConv3d(self.out_dim, name="conv2")(jax.nn.silu(y))
        return y + h


class AttentionBlock(nn.Module):
    """Per-frame single-head spatial attention, zero-init projection."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        y = ChannelRMSNorm(name="norm")(x).reshape(b * t, h * w, c)
        qkv = nn.Dense(3 * c, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jax.nn.softmax(
            jnp.einsum("bic,bjc->bij", q, k).astype(jnp.float32) * c**-0.5, -1
        ).astype(v.dtype)
        y = jnp.einsum("bij,bjc->bic", attn, v)
        y = nn.Dense(c, kernel_init=nn.initializers.zeros, name="proj")(y)
        return x + y.reshape(b, t, h, w, c)


def _spatial(x, fn):
    b, t = x.shape[:2]
    y = fn(x.reshape(b * t, *x.shape[2:]))
    return y.reshape(b, t, *y.shape[1:])


class Resample(nn.Module):
    dim: int
    mode: str  # upsample2d | upsample3d | downsample2d | downsample3d
    # upsample conv output features; default dim // 2 (Wan2.1). Wan2.2
    # resamples keep the full dim.
    up_features: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.mode.startswith("upsample"):
            if self.mode == "upsample3d":
                # time path first: frame 0 passthrough, causal conv doubles
                # the rest (reference streaming equivalence, module docstring)
                first, rest = x[:, :1], x[:, 1:]
                b, t1, h, w, c = rest.shape
                if t1 > 0:
                    y = jnp.pad(rest, ((0, 0), (2, 0), (0, 0), (0, 0), (0, 0)))
                    y = nn.Conv(
                        2 * c, (3, 1, 1), padding="VALID", name="time_conv"
                    )(y)
                    y = y.reshape(b, t1, h, w, 2, c).transpose(0, 1, 4, 2, 3, 5)
                    y = y.reshape(b, 2 * t1, h, w, c)
                    x = jnp.concatenate([first, y], axis=1)
                else:
                    x = first

            def up(frames):
                bt, h, w, c = frames.shape
                frames = jax.image.resize(frames, (bt, 2 * h, 2 * w, c), "nearest")
                return nn.Conv(
                    self.up_features or self.dim // 2, (3, 3), padding="SAME",
                    name="conv",
                )(frames)

            return _spatial(x, up)

        # downsample: spatial first (zero-pad bottom/right, stride 2)
        def down(frames):
            frames = jnp.pad(frames, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(
                self.dim, (3, 3), strides=(2, 2), padding="VALID", name="conv"
            )(frames)

        x = _spatial(x, down)
        if self.mode == "downsample3d":
            first = x[:, :1]
            y = nn.Conv(
                self.dim, (3, 1, 1), strides=(2, 1, 1), padding="VALID",
                name="time_conv",
            )(x)
            x = jnp.concatenate([first, y], axis=1)
        return x


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    dim: int = 96  # Wan2.1-1.3B VAE base dim (z_dim 16)
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temporal_downsample: Tuple[bool, ...] = (False, True, True)


class Encoder3d(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
        x = CausalConv3d(dims[0], name="conv1")(x)
        scale = 1.0
        idx = 0
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            for _ in range(cfg.num_res_blocks):
                x = ResidualBlock(out_dim, name=f"downsamples_{idx}")(x)
                idx += 1
                if scale in cfg.attn_scales:
                    x = AttentionBlock(name=f"downsamples_{idx}")(x)
                    idx += 1
            if i != len(cfg.dim_mult) - 1:
                mode = (
                    "downsample3d" if cfg.temporal_downsample[i] else "downsample2d"
                )
                x = Resample(out_dim, mode, name=f"downsamples_{idx}")(x)
                idx += 1
                scale /= 2.0
        x = ResidualBlock(dims[-1], name="middle_0")(x)
        x = AttentionBlock(name="middle_1")(x)
        x = ResidualBlock(dims[-1], name="middle_2")(x)
        x = ChannelRMSNorm(name="head_norm")(x)
        return CausalConv3d(cfg.z_dim * 2, name="head_conv")(jax.nn.silu(x))


class Decoder3d(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.cfg
        mult = tuple(cfg.dim_mult)
        dims = [cfg.dim * u for u in (mult[-1],) + mult[::-1]]
        temporal_up = tuple(cfg.temporal_downsample)[::-1]
        x = CausalConv3d(dims[0], name="conv1")(z)
        x = ResidualBlock(dims[0], name="middle_0")(x)
        x = AttentionBlock(name="middle_1")(x)
        x = ResidualBlock(dims[0], name="middle_2")(x)
        idx = 0
        scale = 1.0 / 2 ** (len(mult) - 2)
        for i, out_dim in enumerate(dims[1:]):
            for _ in range(cfg.num_res_blocks + 1):
                x = ResidualBlock(out_dim, name=f"upsamples_{idx}")(x)
                idx += 1
                if scale in cfg.attn_scales:
                    x = AttentionBlock(name=f"upsamples_{idx}")(x)
                    idx += 1
            if i != len(mult) - 1:
                mode = "upsample3d" if temporal_up[i] else "upsample2d"
                x = Resample(out_dim, mode, name=f"upsamples_{idx}")(x)
                idx += 1
                scale *= 2.0
        x = ChannelRMSNorm(name="head_norm")(x)
        return CausalConv3d(3, name="head_conv")(jax.nn.silu(x))


class WanVAE(nn.Module):
    """Encode/decode wrapper with latent normalization (deterministic: the
    reference returns the normalized mean, ``vae.py:501-507``)."""

    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder3d(self.cfg, name="encoder")
        self.decoder = Decoder3d(self.cfg, name="decoder")
        self.conv1 = CausalConv3d(self.cfg.z_dim * 2, (1, 1, 1), name="conv1")
        self.conv2 = CausalConv3d(self.cfg.z_dim, (1, 1, 1), name="conv2")

    def encode(self, video: jax.Array) -> jax.Array:
        """video [B, T, H, W, 3] in [-1, 1] -> normalized latents
        [B, 1+(T-1)/4, H/8, W/8, z_dim]."""
        out = self.conv1(self.encoder(video))
        mu = out[..., : self.cfg.z_dim]
        mean = jnp.asarray(WAN_LATENT_MEAN[: self.cfg.z_dim])
        std = jnp.asarray(WAN_LATENT_STD[: self.cfg.z_dim])
        return (mu - mean) / std

    def decode(self, z: jax.Array) -> jax.Array:
        mean = jnp.asarray(WAN_LATENT_MEAN[: self.cfg.z_dim])
        std = jnp.asarray(WAN_LATENT_STD[: self.cfg.z_dim])
        z = z * std + mean
        x = self.decoder(self.conv2(z))
        return jnp.clip(x, -1.0, 1.0)

    def __call__(self, video: jax.Array) -> jax.Array:
        return self.decode(self.encode(video))


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch [out, in, kt, kh, kw] (or [out, in, kh, kw]) -> flax HWIO."""
    w = np.asarray(w)
    if w.ndim == 5:
        return w.transpose(2, 3, 4, 1, 0)
    if w.ndim == 4:
        return w.transpose(2, 3, 1, 0)
    return w.T


def convert_vae_checkpoint(
    state: Dict[str, np.ndarray], cfg: VAEConfig = VAEConfig()
) -> Dict:
    """Reference torch state-dict -> flax params for :class:`WanVAE`.

    Handles the reference's Sequential naming: residual blocks are
    ``<seq>.residual.{0 norm,2 conv,3 norm,6 conv}`` + ``shortcut``;
    attention ``{norm, to_qkv, proj}``; resamples ``resample.1`` (conv after
    pad/upsample) + optional ``time_conv``; heads ``head.{0 norm, 2 conv}``.
    """

    def conv(prefix):
        out = {"conv": {"kernel": _conv_kernel(state[prefix + ".weight"])}}
        if prefix + ".bias" in state:
            out["conv"]["bias"] = np.asarray(state[prefix + ".bias"])
        return out

    def norm(prefix):
        g = np.asarray(state[prefix + ".gamma"]).reshape(-1)
        return {"gamma": g}

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
        qkv_w = np.asarray(state[prefix + ".to_qkv.weight"])[..., 0, 0]  # 1x1 conv
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
        return {k: {"kernel": v["kernel"], **({"bias": v["bias"]} if "bias" in v else {})} for k, v in out.items()}

    params: Dict[str, Any] = {}

    def walk(side: str):
        """encoder/decoder Sequential layout walker (mirrors the module)."""
        mult = tuple(cfg.dim_mult)
        tree: Dict[str, Any] = {"conv1": conv(f"{side}.conv1")}
        is_enc = side == "encoder"
        dims = (
            [cfg.dim * u for u in (1,) + mult]
            if is_enc
            else [cfg.dim * u for u in (mult[-1],) + mult[::-1]]
        )
        temporal = (
            tuple(cfg.temporal_downsample)
            if is_enc
            else tuple(cfg.temporal_downsample)[::-1]
        )
        seq_name = "downsamples" if is_enc else "upsamples"
        n_res = cfg.num_res_blocks if is_enc else cfg.num_res_blocks + 1
        idx = 0
        scale = 1.0 if is_enc else 1.0 / 2 ** (len(mult) - 2)
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            cur_in = in_dim if is_enc else (in_dim // 2 if i in (1, 2, 3) else in_dim)
            for _ in range(n_res):
                tree[f"{seq_name}_{idx}"] = res_block(
                    f"{side}.{seq_name}.{idx}", cur_in != out_dim
                )
                cur_in = out_dim
                idx += 1
                if scale in cfg.attn_scales:
                    tree[f"{seq_name}_{idx}"] = attn_block(f"{side}.{seq_name}.{idx}")
                    idx += 1
            if i != len(mult) - 1:
                if is_enc:
                    mode = "downsample3d" if temporal[i] else "downsample2d"
                    scale /= 2.0
                else:
                    mode = "upsample3d" if temporal[i] else "upsample2d"
                    scale *= 2.0
                tree[f"{seq_name}_{idx}"] = resample(f"{side}.{seq_name}.{idx}", mode)
                idx += 1
        tree["middle_0"] = res_block(f"{side}.middle.0", False)
        tree["middle_1"] = attn_block(f"{side}.middle.1")
        tree["middle_2"] = res_block(f"{side}.middle.2", False)
        tree["head_norm"] = norm(f"{side}.head.0")
        tree["head_conv"] = conv(f"{side}.head.2")
        return tree

    params["encoder"] = walk("encoder")
    params["decoder"] = walk("decoder")
    params["conv1"] = conv("conv1")
    params["conv2"] = conv("conv2")
    return {"params": params}

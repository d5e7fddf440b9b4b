"""XLM-RoBERTa CLIP image/text encoder (frozen, i2v conditioning).

Flax re-design of the reference's open-clip-derived encoder
(``mhla_videogen/diffusion/model/wan/clip.py``: ``VisionTransformer`` :204,
``XLMRobertaWithHead`` :294, ``XLMRobertaCLIP`` :318, ``CLIPModel.visual``
:510-523 — the i2v pipeline feeds frames through the vision tower with
``use_31_block=True`` and hands the [B, 257, 1280] hidden states to the Wan
model's MLPProj) and the trimmed XLM-RoBERTa text tower
(``mhla_videogen/diffusion/model/wan/xlm_roberta.py:10-141``).

Converters map both the reference torch naming (``visual.* / textual.*``,
for real Wan2.1 i2v checkpoints) and HuggingFace ``CLIPVisionModel`` naming
(golden tests) onto these modules.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import sdpa

# CLIP preprocessing constants (reference clip.py:402-403,447-448)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: float = 4.0
    out_dim: int = 1024
    num_heads: int = 16
    num_layers: int = 32
    pool_type: str = "token"  # token | token_fc | none
    pre_norm: bool = True
    post_norm: bool = False
    activation: str = "gelu"  # gelu | quick_gelu
    eps: float = 1e-5
    dtype: Any = jnp.float32


@dataclasses.dataclass(frozen=True)
class XLMRConfig:
    vocab_size: int = 250002
    max_seq_len: int = 514
    type_size: int = 1
    pad_id: int = 1
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    post_norm: bool = True
    out_dim: int = 1024
    eps: float = 1e-5
    dtype: Any = jnp.float32


# Wan2.1 i2v conditioning encoder: open-clip xlm-roberta-large ViT-H/14
# (reference clip.py:462-487)
CLIP_VIT_H_14 = CLIPVisionConfig()
XLM_ROBERTA_LARGE = XLMRConfig()


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: jax.nn.gelu(x, approximate=False)


def pos_interpolate(pos: jax.Array, seq_len: int) -> jax.Array:
    """Bicubic grid interpolation of learned positions (clip.py:25-45).

    ``pos`` is [1, n_prefix + g*g, dim]; the grid part is resized to match
    ``seq_len`` while prefix (cls) entries pass through.
    """
    if pos.shape[1] == seq_len:
        return pos
    src = int(math.sqrt(pos.shape[1]))
    tar = int(math.sqrt(seq_len))
    n = pos.shape[1] - src * src
    grid = pos[:, n:].reshape(1, src, src, -1)
    grid = jax.image.resize(grid, (1, tar, tar, grid.shape[-1]), "cubic")
    return jnp.concatenate([pos[:, :n], grid.reshape(1, tar * tar, -1)], axis=1)


class CLIPAttention(nn.Module):
    """Fused-qkv multi-head attention (clip.py:58-90)."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool = False) -> jax.Array:
        b, s, _ = x.shape
        h, d = self.num_heads, self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, s, 3, h, d), 3, axis=2)
        o = sdpa(q[:, :, 0], k[:, :, 0], v[:, :, 0], causal=causal)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(
            o.reshape(b, s, self.dim)
        )


class CLIPBlock(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=cfg.eps, dtype=jnp.float32, name=name
        )
        attn = CLIPAttention(cfg.dim, cfg.num_heads, cfg.dtype, name="attn")
        mid = int(cfg.dim * cfg.mlp_ratio)
        act = _act(cfg.activation)

        def mlp(y):
            y = nn.Dense(mid, dtype=cfg.dtype, name="fc1")(y)
            y = act(y)
            return nn.Dense(cfg.dim, dtype=cfg.dtype, name="fc2")(y)

        if cfg.post_norm:
            x = x + ln("norm1")(attn(x)).astype(x.dtype)
            x = x + ln("norm2")(mlp(x)).astype(x.dtype)
        else:
            x = x + attn(ln("norm1")(x).astype(x.dtype))
            x = x + mlp(ln("norm2")(x).astype(x.dtype))
        return x


class CLIPVisionTransformer(nn.Module):
    """The i2v image tower. Input NHWC in CLIP-normalized space."""

    cfg: CLIPVisionConfig = CLIP_VIT_H_14

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, H, W, 3]
        use_31_block: bool = False,
        interpolation: bool = False,
    ) -> jax.Array:
        cfg = self.cfg
        b = x.shape[0]
        n_patches = (cfg.image_size // cfg.patch_size) ** 2
        has_cls = cfg.pool_type in ("token", "token_fc")

        h = nn.Conv(
            cfg.dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=not cfg.pre_norm,
            dtype=cfg.dtype,
            name="patch_embedding",
        )(x)
        h = h.reshape(b, -1, cfg.dim)

        gain = 1.0 / math.sqrt(cfg.dim)
        if has_cls:
            cls = self.param(
                "cls_embedding", nn.initializers.normal(gain), (1, 1, cfg.dim),
                jnp.float32,
            )
            h = jnp.concatenate(
                [jnp.broadcast_to(cls, (b, 1, cfg.dim)).astype(h.dtype), h], axis=1
            )
        pos = self.param(
            "pos_embedding", nn.initializers.normal(gain),
            (1, n_patches + int(has_cls), cfg.dim), jnp.float32,
        )
        if interpolation:
            pos = pos_interpolate(pos, h.shape[1])
        h = h + pos.astype(h.dtype)

        if cfg.pre_norm:
            h = nn.LayerNorm(epsilon=cfg.eps, dtype=jnp.float32, name="pre_norm")(
                h
            ).astype(h.dtype)

        # the reference forward stops at the blocks (clip.py:286-291):
        # post_norm/head only feed the contrastive path, which i2v never uses
        n = cfg.num_layers - 1 if use_31_block else cfg.num_layers
        for i in range(n):
            h = CLIPBlock(cfg, name=f"blocks_{i}")(h)
        return h


class XLMRobertaBlock(nn.Module):
    """Post-norm roberta block (xlm_roberta.py:48-69)."""

    cfg: XLMRConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
        cfg = self.cfg
        b, s, _ = x.shape
        h, d = cfg.num_heads, cfg.dim // cfg.num_heads
        dense = lambda name: nn.Dense(cfg.dim, dtype=cfg.dtype, name=name)  # noqa: E731
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=cfg.eps, dtype=jnp.float32, name=name
        )

        q = dense("q")(x).reshape(b, s, h, d)
        k = dense("k")(x).reshape(b, s, h, d)
        v = dense("v")(x).reshape(b, s, h, d)
        a = dense("o")(sdpa(q, k, v, mask=mask).reshape(b, s, cfg.dim))

        if cfg.post_norm:
            x = ln("norm1")(x + a).astype(x.dtype)
        else:
            x = x + a

        y = nn.Dense(cfg.dim * 4, dtype=cfg.dtype, name="ffn_fc1")(x)
        y = nn.Dense(cfg.dim, dtype=cfg.dtype, name="ffn_fc2")(
            jax.nn.gelu(y, approximate=False)
        )
        if cfg.post_norm:
            x = ln("norm2")(x + y).astype(x.dtype)
        else:
            x = x + y
        return x


class XLMRobertaEncoder(nn.Module):
    """XLM-RoBERTa without pooler/LM head (xlm_roberta.py:72-141)."""

    cfg: XLMRConfig = XLM_ROBERTA_LARGE

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        cfg = self.cfg
        mask = (ids != cfg.pad_id).astype(jnp.int32)
        embed = lambda n, v, name: nn.Embed(  # noqa: E731
            n, cfg.dim, dtype=cfg.dtype, name=name
        )(v)
        # pad-aware position ids: pad_id + cumsum(mask)*mask (reference :126)
        pos_ids = cfg.pad_id + jnp.cumsum(mask, axis=1) * mask
        x = (
            embed(cfg.vocab_size, ids, "token_embedding")
            + embed(cfg.type_size, jnp.zeros_like(ids), "type_embedding")
            + embed(cfg.max_seq_len, pos_ids, "pos_embedding")
        )
        norm = nn.LayerNorm(epsilon=cfg.eps, dtype=jnp.float32, name="norm")
        if cfg.post_norm:
            x = norm(x).astype(x.dtype)
        attn_mask = mask[:, None, None, :].astype(bool)
        for i in range(cfg.num_layers):
            x = XLMRobertaBlock(cfg, name=f"blocks_{i}")(x, attn_mask)
        if not cfg.post_norm:
            x = norm(x).astype(x.dtype)
        return x


class XLMRobertaWithHead(nn.Module):
    """Masked mean-pool + 2-layer GELU head (clip.py:294-315)."""

    cfg: XLMRConfig = XLM_ROBERTA_LARGE

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        cfg = self.cfg
        x = XLMRobertaEncoder(cfg, name="encoder")(ids)
        mask = (ids != cfg.pad_id).astype(x.dtype)[..., None]
        x = (x * mask).sum(axis=1) / mask.sum(axis=1)
        mid = (cfg.dim + cfg.out_dim) // 2
        x = nn.Dense(mid, use_bias=False, dtype=cfg.dtype, name="head_fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(
            cfg.out_dim, use_bias=False, dtype=cfg.dtype, name="head_fc2"
        )(x)


class XLMRobertaCLIP(nn.Module):
    """Full contrastive pair (clip.py:318-409). i2v uses only ``visual``."""

    vision: CLIPVisionConfig = CLIP_VIT_H_14
    text: XLMRConfig = XLM_ROBERTA_LARGE

    def setup(self):
        self.visual = CLIPVisionTransformer(self.vision)
        self.textual = XLMRobertaWithHead(self.text)
        self.log_scale = self.param(
            "log_scale",
            lambda *_: jnp.asarray(math.log(1 / 0.07), jnp.float32),
        )

    def __call__(self, imgs: jax.Array, txt_ids: jax.Array):
        xi = self.visual(imgs)
        xt = self.textual(txt_ids)
        return xi, xt

    def encode_image(
        self, imgs: jax.Array, use_31_block: bool = True
    ) -> jax.Array:
        return self.visual(imgs, use_31_block=use_31_block)


def preprocess_frames(frames: jax.Array, image_size: int = 224) -> jax.Array:
    """[-1, 1] NHWC frames -> CLIP-normalized 224x224 (clip.py:510-518:
    bicubic resize, map to [0,1], normalize with CLIP mean/std)."""
    b = frames.shape[0]
    x = jax.image.resize(
        frames.astype(jnp.float32),
        (b, image_size, image_size, frames.shape[-1]),
        "cubic",
    )
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (x * 0.5 + 0.5 - mean) / std


def encode_i2v_features(
    model: CLIPVisionTransformer, params, frames: jax.Array
) -> jax.Array:
    """First-frame conditioning features for the Wan i2v branch:
    preprocess + 31-block hidden states, [B, 257, 1280]."""
    x = preprocess_frames(frames, model.cfg.image_size)
    return model.apply(params, x, use_31_block=True)


# ---------------------------------------------------------------------------
# Checkpoint converters
# ---------------------------------------------------------------------------


def _ln(state, prefix):
    return {
        "scale": np.asarray(state[prefix + ".weight"]),
        "bias": np.asarray(state[prefix + ".bias"]),
    }


def _dense(state, prefix, bias=True):
    out = {"kernel": np.asarray(state[prefix + ".weight"]).T}
    if bias:
        out["bias"] = np.asarray(state[prefix + ".bias"])
    return out


def convert_clip_vision(
    state: Dict[str, np.ndarray], cfg: CLIPVisionConfig, prefix: str = "visual."
) -> Dict:
    """Reference torch naming (clip.py ``VisionTransformer``) -> flax params.
    ``patch_embedding.weight`` [D,3,p,p] transposes to HWIO."""
    g = lambda k: state[prefix + k]  # noqa: E731
    params: Dict[str, Any] = {
        "patch_embedding": {
            "kernel": np.asarray(g("patch_embedding.weight")).transpose(2, 3, 1, 0)
        },
        "pos_embedding": np.asarray(g("pos_embedding")),
    }
    if not cfg.pre_norm:
        params["patch_embedding"]["bias"] = np.asarray(g("patch_embedding.bias"))
    else:
        params["pre_norm"] = _ln(state, prefix + "pre_norm")
    if cfg.pool_type in ("token", "token_fc"):
        params["cls_embedding"] = np.asarray(g("cls_embedding"))
    for i in range(cfg.num_layers):
        p = f"{prefix}transformer.{i}."
        params[f"blocks_{i}"] = {
            "norm1": _ln(state, p + "norm1"),
            "norm2": _ln(state, p + "norm2"),
            "attn": {
                "to_qkv": _dense(state, p + "attn.to_qkv"),
                "proj": _dense(state, p + "attn.proj"),
            },
            "fc1": _dense(state, p + "mlp.0"),
            "fc2": _dense(state, p + "mlp.2"),
        }
    return {"params": params}


def convert_xlm_roberta(
    state: Dict[str, np.ndarray], cfg: XLMRConfig, prefix: str = ""
) -> Dict:
    """Reference torch naming (xlm_roberta.py ``XLMRoberta``) -> flax params
    for :class:`XLMRobertaEncoder`."""
    g = lambda k: np.asarray(state[prefix + k])  # noqa: E731
    params: Dict[str, Any] = {
        "token_embedding": {"embedding": g("token_embedding.weight")},
        "type_embedding": {"embedding": g("type_embedding.weight")},
        "pos_embedding": {"embedding": g("pos_embedding.weight")},
        "norm": _ln(state, prefix + "norm"),
    }
    for i in range(cfg.num_layers):
        p = f"{prefix}blocks.{i}."
        params[f"blocks_{i}"] = {
            "q": _dense(state, p + "attn.q"),
            "k": _dense(state, p + "attn.k"),
            "v": _dense(state, p + "attn.v"),
            "o": _dense(state, p + "attn.o"),
            "norm1": _ln(state, p + "norm1"),
            "norm2": _ln(state, p + "norm2"),
            "ffn_fc1": _dense(state, p + "ffn.0"),
            "ffn_fc2": _dense(state, p + "ffn.2"),
        }
    return {"params": params}


def convert_clip_checkpoint(
    state: Dict[str, np.ndarray],
    vision: CLIPVisionConfig = CLIP_VIT_H_14,
    text: XLMRConfig = XLM_ROBERTA_LARGE,
) -> Dict:
    """Full reference ``XLMRobertaCLIP`` state dict (Wan2.1 i2v conditioning
    checkpoint) -> flax params for :class:`XLMRobertaCLIP`."""
    textual = convert_xlm_roberta(state, text, prefix="textual.")["params"]
    params = {
        "visual": convert_clip_vision(state, vision, prefix="visual.")["params"],
        "textual": {
            "encoder": textual,
            "head_fc1": _dense(state, "textual.head.0", bias=False),
            "head_fc2": _dense(state, "textual.head.2", bias=False),
        },
        "log_scale": np.asarray(state["log_scale"]),
    }
    return {"params": params}


def convert_hf_clip_vision(
    state: Dict[str, np.ndarray], cfg: CLIPVisionConfig
) -> Dict:
    """HuggingFace ``CLIPVisionModel`` state dict -> flax params (golden
    tests; HF splits q/k/v, we fuse them into ``to_qkv``)."""
    pre = "vision_model."
    params: Dict[str, Any] = {
        "patch_embedding": {
            "kernel": np.asarray(
                state[pre + "embeddings.patch_embedding.weight"]
            ).transpose(2, 3, 1, 0)
        },
        "cls_embedding": np.asarray(
            state[pre + "embeddings.class_embedding"]
        ).reshape(1, 1, -1),
        "pos_embedding": np.asarray(
            state[pre + "embeddings.position_embedding.weight"]
        )[None],
        "pre_norm": _ln(state, pre + "pre_layrnorm"),
    }
    for i in range(cfg.num_layers):
        p = f"{pre}encoder.layers.{i}."
        qkv_w = np.concatenate(
            [np.asarray(state[p + f"self_attn.{n}_proj.weight"]) for n in "qkv"]
        )
        qkv_b = np.concatenate(
            [np.asarray(state[p + f"self_attn.{n}_proj.bias"]) for n in "qkv"]
        )
        params[f"blocks_{i}"] = {
            "norm1": _ln(state, p + "layer_norm1"),
            "norm2": _ln(state, p + "layer_norm2"),
            "attn": {
                "to_qkv": {"kernel": qkv_w.T, "bias": qkv_b},
                "proj": _dense(state, p + "self_attn.out_proj"),
            },
            "fc1": _dense(state, p + "mlp.fc1"),
            "fc2": _dense(state, p + "mlp.fc2"),
        }
    return {"params": params}

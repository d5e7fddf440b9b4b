"""umT5 text encoder (frozen, for the video pipeline).

Flax re-design of the reference's trimmed T5 stack
(``mhla_videogen/diffusion/model/wan/t5.py``: ``T5Attention`` :64 — unscaled
attention with additive relative-position bias, ``T5FeedForward`` :116 —
gated-GELU, ``T5RelativeEmbedding`` :187 — log-bucketed relative positions,
``T5Encoder`` :232; umt5_xxl config :403-417 — 24 layers, dim 4096, 64 heads,
per-layer position embeddings).

``convert_t5_checkpoint`` maps the reference torch state-dict naming onto
this module's params so Wan2.1 text-encoder weights load directly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    shared_pos: bool = False  # umT5: per-layer relative embeddings
    max_dist: int = 128
    eps: float = 1e-6
    dtype: Any = jnp.float32


UMT5_XXL = T5Config()


def relative_position_bucket(
    rel_pos: np.ndarray, num_buckets: int = 32, max_dist: int = 128,
    bidirectional: bool = True,
) -> np.ndarray:
    """T5 log-bucketed relative positions (reference :205-230)."""
    if bidirectional:
        half = num_buckets // 2
        buckets = (rel_pos > 0).astype(np.int64) * half
        rel_pos = np.abs(rel_pos)
    else:
        half = num_buckets
        buckets = np.zeros_like(rel_pos)
        rel_pos = -np.minimum(rel_pos, 0)
    max_exact = half // 2
    large = max_exact + (
        np.log(np.maximum(rel_pos, 1) / max_exact)
        / math.log(max_dist / max_exact)
        * (half - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, half - 1)
    return buckets + np.where(rel_pos < max_exact, rel_pos, large)


class T5LayerNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + self.eps)
        return (xf * w).astype(x.dtype)


class T5RelativeEmbedding(nn.Module):
    num_buckets: int
    num_heads: int
    max_dist: int = 128

    @nn.compact
    def __call__(self, lq: int, lk: int) -> jax.Array:
        table = self.param(
            "embedding",
            nn.initializers.normal((2 * self.num_buckets * self.num_heads) ** -0.5),
            (self.num_buckets, self.num_heads),
            jnp.float32,
        )
        rel = np.arange(lk)[None, :] - np.arange(lq)[:, None]
        buckets = jnp.asarray(
            relative_position_bucket(rel, self.num_buckets, self.max_dist), jnp.int32
        )
        # jnp.asarray: the table may arrive as a numpy array (msgpack-restored
        # params) and numpy can't be fancy-indexed by a traced index array
        return jnp.asarray(table)[buckets].transpose(2, 0, 1)[None]  # [1, H, Lq, Lk]


class T5EncoderBlock(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array],
        pos_bias: Optional[jax.Array],
    ) -> jax.Array:
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.dim_attn // cfg.num_heads
        dense = lambda n, name: nn.Dense(  # noqa: E731
            n, use_bias=False, dtype=cfg.dtype, name=name
        )

        if pos_bias is None:  # per-layer relative embedding (umT5)
            pos_bias = T5RelativeEmbedding(
                cfg.num_buckets, cfg.num_heads, cfg.max_dist, name="pos_embedding"
            )(x.shape[1], x.shape[1])

        y = T5LayerNorm(cfg.eps, name="norm1")(x)
        b, t, _ = y.shape
        q = dense(cfg.dim_attn, "q")(y).reshape(b, t, h, d)
        k = dense(cfg.dim_attn, "k")(y).reshape(b, t, h, d)
        v = dense(cfg.dim_attn, "v")(y).reshape(b, t, h, d)

        bias = pos_bias.astype(jnp.float32)
        if mask is not None:
            bias = bias + jnp.where(mask[:, None, None, :], 0.0, -1e9)
        # T5 attention is unscaled (reference :105)
        attn = jnp.einsum("bihd,bjhd->bhij", q, k).astype(jnp.float32) + bias
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        y = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, t, cfg.dim_attn)
        x = x + dense(cfg.dim, "o")(y)

        y = T5LayerNorm(cfg.eps, name="norm2")(x)
        # tanh-approximated GELU (reference GELU, t5.py:45-47)
        gate = jax.nn.gelu(dense(cfg.dim_ffn, "ffn_gate")(y), approximate=True)
        y = dense(cfg.dim_ffn, "ffn_fc1")(y) * gate
        x = x + dense(cfg.dim, "ffn_fc2")(y)
        return x


class T5Encoder(nn.Module):
    cfg: T5Config = UMT5_XXL

    @nn.compact
    def __call__(
        self, ids: jax.Array, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        cfg = self.cfg
        x = nn.Embed(
            cfg.vocab_size, cfg.dim,
            embedding_init=nn.initializers.normal(1.0),
            dtype=cfg.dtype, name="token_embedding",
        )(ids)
        pos_bias = None
        if cfg.shared_pos:
            pos_bias = T5RelativeEmbedding(
                cfg.num_buckets, cfg.num_heads, cfg.max_dist, name="pos_embedding"
            )(ids.shape[1], ids.shape[1])
        for i in range(cfg.num_layers):
            x = T5EncoderBlock(cfg, name=f"blocks_{i}")(x, mask, pos_bias)
        return T5LayerNorm(cfg.eps, name="norm")(x)


def convert_hf_umt5(state: Dict[str, np.ndarray], cfg: T5Config) -> Dict:
    """HuggingFace UMT5 encoder state-dict -> flax params. HF naming:
    ``encoder.block.{i}.layer.0.SelfAttention.{q,k,v,o}`` (+ per-layer
    ``relative_attention_bias``), ``layer.1.DenseReluDense.{wi_0,wi_1,wo}``
    (wi_0 = gate), and ``shared``/``encoder.final_layer_norm``."""

    def lin(k):
        return np.asarray(state[k]).T

    params: Dict[str, Any] = {
        "token_embedding": {"embedding": np.asarray(state["shared.weight"])},
        "norm": {"weight": np.asarray(state["encoder.final_layer_norm.weight"])},
    }
    for i in range(cfg.num_layers):
        p = f"encoder.block.{i}.layer."
        params[f"blocks_{i}"] = {
            "norm1": {"weight": np.asarray(state[p + "0.layer_norm.weight"])},
            "norm2": {"weight": np.asarray(state[p + "1.layer_norm.weight"])},
            "q": {"kernel": lin(p + "0.SelfAttention.q.weight")},
            "k": {"kernel": lin(p + "0.SelfAttention.k.weight")},
            "v": {"kernel": lin(p + "0.SelfAttention.v.weight")},
            "o": {"kernel": lin(p + "0.SelfAttention.o.weight")},
            "pos_embedding": {
                "embedding": np.asarray(
                    state[p + "0.SelfAttention.relative_attention_bias.weight"]
                )
            },
            "ffn_gate": {"kernel": lin(p + "1.DenseReluDense.wi_0.weight")},
            "ffn_fc1": {"kernel": lin(p + "1.DenseReluDense.wi_1.weight")},
            "ffn_fc2": {"kernel": lin(p + "1.DenseReluDense.wo.weight")},
        }
    return {"params": params}


def convert_t5_checkpoint(
    state: Dict[str, np.ndarray], cfg: T5Config = UMT5_XXL
) -> Dict:
    """Torch state-dict (reference t5.py naming, encoder prefix stripped) ->
    flax params for :class:`T5Encoder`. Linear kernels are transposed."""

    def lin(k):
        return np.asarray(state[k]).T

    params: Dict[str, Any] = {
        "token_embedding": {"embedding": np.asarray(state["token_embedding.weight"])},
        "norm": {"weight": np.asarray(state["norm.weight"])},
    }
    if cfg.shared_pos:
        params["pos_embedding"] = {
            "embedding": np.asarray(state["pos_embedding.embedding.weight"])
        }
    for i in range(cfg.num_layers):
        p = f"blocks.{i}."
        blk = {
            "norm1": {"weight": np.asarray(state[p + "norm1.weight"])},
            "norm2": {"weight": np.asarray(state[p + "norm2.weight"])},
            "q": {"kernel": lin(p + "attn.q.weight")},
            "k": {"kernel": lin(p + "attn.k.weight")},
            "v": {"kernel": lin(p + "attn.v.weight")},
            "o": {"kernel": lin(p + "attn.o.weight")},
            "ffn_gate": {"kernel": lin(p + "ffn.gate.0.weight")},
            "ffn_fc1": {"kernel": lin(p + "ffn.fc1.weight")},
            "ffn_fc2": {"kernel": lin(p + "ffn.fc2.weight")},
        }
        if not cfg.shared_pos:
            blk["pos_embedding"] = {
                "embedding": np.asarray(state[p + "pos_embedding.embedding.weight"])
            }
        params[f"blocks_{i}"] = blk
    return {"params": params}


class T5TextEncoder:
    """Live prompt encoding for the video pipeline (the reference's
    in-process ``T5EncoderModel``, ``t5.py:421-470`` + ``inference.py:206``):
    tokenize padded/truncated to ``text_len`` with whitespace cleaning, run
    the frozen encoder with the attention mask, and zero every position past
    each prompt's length — the reference trims to ``seq_lens`` and the model
    zero-pads back to ``text_len``, which is the same tensor.

    ``t5_dir`` layout:
      ``config.json``     optional ``T5Config`` field overrides, plus an
                          optional ``"tokenizer"`` HF name/path
                          (default: ``<t5_dir>/tokenizer``)
      ``params.msgpack``  flax-serialized params (no template needed), OR
      ``*.safetensors``   HF UMT5 encoder state dict (``convert_hf_umt5``), OR
      ``*.pth``           reference torch state dict (``convert_t5_checkpoint``)
    """

    def __init__(self, t5_dir: str, text_len: int, dtype: Any = jnp.float32):
        import json
        from pathlib import Path

        d = Path(t5_dir)
        raw = json.loads((d / "config.json").read_text()) if (d / "config.json").exists() else {}
        tokenizer_name = raw.pop("tokenizer", str(d / "tokenizer"))
        fields = {f.name for f in dataclasses.fields(T5Config)}
        # the constructor's dtype wins over a config.json "dtype" entry
        # (a dumped T5Config would otherwise collide with the explicit kwarg)
        kw = {k: v for k, v in raw.items() if k in fields and k != "dtype"}
        self.cfg = T5Config(**kw, dtype=dtype)
        self.text_len = text_len

        msgpack = d / "params.msgpack"
        if msgpack.exists():
            from flax import serialization

            self.params = serialization.msgpack_restore(msgpack.read_bytes())
        else:
            sts = sorted(d.glob("*.safetensors"))
            pths = sorted(list(d.glob("*.pth")) + list(d.glob("*.pt")))
            if sts:
                from safetensors.numpy import load_file

                state: Dict[str, np.ndarray] = {}
                for f in sts:
                    state.update(load_file(str(f)))
                self.params = convert_hf_umt5(state, self.cfg)
            elif pths:
                import torch

                state = {}
                for f in pths:
                    blob = torch.load(str(f), map_location="cpu", weights_only=True)
                    state.update({k: v.float().numpy() for k, v in blob.items()})
                self.params = convert_t5_checkpoint(state, self.cfg)
            else:
                raise FileNotFoundError(
                    f"no params.msgpack / *.safetensors / *.pth under {t5_dir}"
                )

        from ..data.tokenizers import PromptTokenizer

        self.tokenizer = PromptTokenizer(
            tokenizer_name, seq_len=text_len, clean="whitespace"
        )
        enc = T5Encoder(self.cfg)
        # params are a jit ARGUMENT: closing over them would bake the full
        # encoder (umt5-xxl: ~5.9B params) into the HLO as constants —
        # pathological compile + doubled device memory (CLAUDE.md rule)
        self._apply = jax.jit(
            lambda p, ids, mask: enc.apply(p, ids, mask)
            * mask[..., None].astype(dtype)
        )

    def __call__(self, texts) -> jax.Array:
        """texts -> [B, text_len, dim] embeddings, zeroed past each length."""
        ids, mask = self.tokenizer(texts, return_mask=True)
        return self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask))

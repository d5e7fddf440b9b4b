"""MHLA causal language model (the GLA-architecture LM family).

TPU-native re-design of the reference LM stack
(``mhla_nlp/fla/models/gla/modeling_gla.py:41-420`` + ``configuration_gla.py``):
pre-norm blocks of [RMSNorm -> attention -> residual -> RMSNorm -> GatedMLP
-> residual], where the attention module is selected per layer:

- ``attn_extends='mhla'`` -> :class:`~mhla_tpu.layers.MHLACausal` (default)
- ``attn_extends='linear_attn'`` -> global linear attention
- softmax layers listed in ``config.attn['layers']`` -> SelfAttention
  (the hybrid seam, reference ``modeling_gla.py:50-61``)

Config field names mirror the reference JSON (``configs/mhla_340M.json``) so
reference configs load directly. Weight init follows the reference scheme:
normal(initializer_range) everywhere + GPT-2-style 1/sqrt(2L) rescale of
o_proj/down_proj (``modeling_gla.py:192-216``), applied functionally by
:func:`init_lm_params`.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from ..layers import GatedMLP, MHLACausal, RMSNorm, SelfAttention
from ..layers.linear_attn import linear_attention
from ..layers.norms import rms_norm


@dataclasses.dataclass
class MHLALMConfig:
    hidden_size: int = 1024
    expand_k: float = 0.5
    expand_v: float = 1.0
    hidden_ratio: int = 4
    intermediate_size: Optional[int] = None
    num_hidden_layers: int = 24
    num_heads: int = 4
    num_kv_heads: Optional[int] = None
    feature_map: Optional[str] = "relu"
    attn_mode: str = "chunk"
    use_short_conv: bool = False
    conv_size: int = 4
    use_output_gate: bool = True
    hidden_act: str = "swish"
    max_position_embeddings: int = 2048
    elementwise_affine: bool = True
    norm_eps: float = 1e-6
    attn: Optional[Dict[str, Any]] = None  # hybrid softmax layers
    vocab_size: int = 32000
    tie_word_embeddings: bool = True
    initializer_range: float = 0.02
    fuse_cross_entropy: bool = True
    use_l2warp: bool = False  # L2Wrap max-logit pull (fla/modules/l2warp.py)
    attn_extends: str = "mhla"
    chunk_size: int = 64
    dtype: Any = jnp.float32
    # head-axis tensor parallelism: set at runtime (never serialized) to a
    # jax.sharding.Mesh with a 'tensor' axis > 1 — the trainer's
    # --train.n_tensor knob routes MHLA attention through shard_map
    # (parallel.tensor_parallel.mhla_attention_tp_flat)
    tp_mesh: Any = None

    @property
    def num_slots(self) -> int:
        return max(1, -(-self.max_position_embeddings // self.chunk_size))

    @classmethod
    def from_json(cls, path: str, **overrides) -> "MHLALMConfig":
        """Load a reference-format model JSON (e.g. mhla_340M.json)."""
        with open(path) as f:
            raw = json.load(f)
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in fields}
        kwargs.update(overrides)
        return cls(**kwargs)


class _LinearAttnLayer(nn.Module):
    """Plain global linear attention LM layer (simple baseline)."""

    config: MHLALMConfig

    @nn.compact
    def __call__(self, x, state=None, use_cache=False):
        cfg = self.config
        b, t, _ = x.shape
        h = cfg.num_heads
        dk = int(cfg.hidden_size * cfg.expand_k) // h
        dv = int(cfg.hidden_size * cfg.expand_v) // h
        dense = lambda n, name: nn.Dense(  # noqa: E731
            n, use_bias=False, dtype=cfg.dtype, name=name
        )
        q = jax.nn.relu(dense(h * dk, "q_proj")(x).reshape(b, t, h, dk))
        k = jax.nn.relu(dense(h * dk, "k_proj")(x).reshape(b, t, h, dk))
        v = dense(h * dv, "v_proj")(x).reshape(b, t, h, dv)
        # causal cumulative linear attention
        kv = jnp.cumsum(jnp.einsum("bthk,bthv->bthkv", k, v), axis=1)
        z = jnp.cumsum(k, axis=1)
        num = jnp.einsum("bthk,bthkv->bthv", q, kv)
        den = jnp.einsum("bthk,bthk->bth", q, z) + 1e-6
        o = (num / den[..., None]).reshape(b, t, h * dv)
        return dense(cfg.hidden_size, "o_proj")(o), None


class MHLABlock(nn.Module):
    config: MHLALMConfig
    layer_idx: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        state: Optional[Any] = None,
        use_cache: bool = False,
        attention_mask: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
    ):
        cfg = self.config
        # 'transformer' = every layer softmax (the reference's transformer
        # model family); otherwise layers listed in cfg.attn are softmax
        # (the hybrid seam) and the rest use attn_extends
        is_softmax = cfg.attn_extends == "transformer" or (
            cfg.attn is not None and self.layer_idx in cfg.attn.get("layers", ())
        )
        if segment_ids is not None and not (
            is_softmax or cfg.attn_extends == "mhla"
        ):
            raise NotImplementedError(
                "packed-varlen segment_ids is implemented for the mhla and "
                f"softmax attention paths, not attn_extends={cfg.attn_extends}"
            )

        h = RMSNorm(eps=cfg.norm_eps, name="attn_norm")(x)
        if is_softmax:
            attn_cfg = cfg.attn or {}
            attn = SelfAttention(
                hidden_size=cfg.hidden_size,
                num_heads=attn_cfg.get("num_heads", cfg.num_heads),
                num_kv_heads=attn_cfg.get("num_kv_heads"),
                qkv_bias=attn_cfg.get("qkv_bias", False),
                window_size=attn_cfg.get("window_size"),
                rope_theta=attn_cfg.get("rope_theta", 10000.0),
                max_position_embeddings=cfg.max_position_embeddings,
                dtype=cfg.dtype,
                name="attn",
            )
            h, new_state = attn(h, state, use_cache, segment_ids)
        elif cfg.attn_extends == "mhla":
            attn = MHLACausal(
                hidden_size=cfg.hidden_size,
                expand_k=cfg.expand_k,
                expand_v=cfg.expand_v,
                num_heads=cfg.num_heads,
                num_kv_heads=cfg.num_kv_heads,
                feature_map=cfg.feature_map,
                use_short_conv=cfg.use_short_conv,
                conv_size=cfg.conv_size,
                use_output_gate=cfg.use_output_gate,
                elementwise_affine=cfg.elementwise_affine,
                norm_eps=cfg.norm_eps,
                chunk_size=cfg.chunk_size,
                num_slots=cfg.num_slots,
                mode=cfg.attn_mode,
                dtype=cfg.dtype,
                tp_mesh=cfg.tp_mesh,
                name="attn",
            )
            h, new_state = attn(h, state, use_cache, attention_mask, segment_ids)
        elif cfg.attn_extends in ("gla", "simple_gla"):
            from ..layers.gla import GatedLinearAttention

            attn = GatedLinearAttention(
                hidden_size=cfg.hidden_size,
                expand_k=cfg.expand_k,
                expand_v=cfg.expand_v,
                num_heads=cfg.num_heads,
                num_kv_heads=cfg.num_kv_heads,
                feature_map=cfg.feature_map,
                use_output_gate=cfg.use_output_gate,
                elementwise_affine=cfg.elementwise_affine,
                norm_eps=cfg.norm_eps,
                chunk_size=cfg.chunk_size,
                simple=cfg.attn_extends == "simple_gla",
                dtype=cfg.dtype,
                name="attn",
            )
            h, new_state = attn(h, state, use_cache)
        elif cfg.attn_extends == "gated_deltanet":
            from ..layers.gated_deltanet import GatedDeltaNet

            attn = GatedDeltaNet(
                hidden_size=cfg.hidden_size,
                head_dim=int(cfg.hidden_size * cfg.expand_k) // cfg.num_heads,
                num_heads=cfg.num_heads,
                expand_v=cfg.expand_v / cfg.expand_k,
                norm_eps=cfg.norm_eps,
                dtype=cfg.dtype,
                name="attn",
            )
            h, new_state = attn(h, state, use_cache)
        elif cfg.attn_extends == "mamba2":
            from ..layers.mamba2 import Mamba2

            attn = Mamba2(
                hidden_size=cfg.hidden_size,
                head_dim=max(int(cfg.hidden_size * cfg.expand_v) // cfg.num_heads, 8),
                chunk_size=cfg.chunk_size,
                norm_eps=cfg.norm_eps,
                dtype=cfg.dtype,
                name="attn",
            )
            h, new_state = attn(h, state, use_cache)
        elif cfg.attn_extends == "mamba":
            from ..layers.mamba import Mamba

            attn = Mamba(
                hidden_size=cfg.hidden_size,
                chunk_size=cfg.chunk_size,
                dtype=cfg.dtype,
                name="attn",
            )
            h, new_state = attn(h, state, use_cache)
        elif cfg.attn_extends == "linear_attn":
            h, new_state = _LinearAttnLayer(cfg, name="attn")(h, state, use_cache)
        else:
            raise NotImplementedError(f"attn_extends={cfg.attn_extends}")
        x = x + h

        h = RMSNorm(eps=cfg.norm_eps, name="mlp_norm")(x)
        h = GatedMLP(
            hidden_size=cfg.hidden_size,
            hidden_ratio=cfg.hidden_ratio,
            intermediate_size=cfg.intermediate_size,
            dtype=cfg.dtype,
            name="mlp",
        )(h)
        return x + h, new_state


class MHLAModel(nn.Module):
    config: MHLALMConfig
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,  # [B, T] int32
        states: Optional[List[Any]] = None,
        use_cache: bool = False,
        attention_mask: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
    ):
        cfg = self.config
        x = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            dtype=cfg.dtype,
            name="embeddings",
        )(input_ids)

        block_cls = nn.remat(MHLABlock, static_argnums=(3,)) if self.remat else MHLABlock
        new_states = []
        for i in range(cfg.num_hidden_layers):
            layer_state = states[i] if states is not None else None
            x, s = block_cls(cfg, i, name=f"layers_{i}")(
                x, layer_state, use_cache, attention_mask, segment_ids
            )
            new_states.append(s)
        x = RMSNorm(eps=cfg.norm_eps, name="norm")(x)
        return x, (new_states if use_cache else None)


class MHLAForCausalLM(nn.Module):
    config: MHLALMConfig
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        states: Optional[List[Any]] = None,
        use_cache: bool = False,
        output_hidden: bool = False,
        attention_mask: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
    ):
        cfg = self.config
        x, new_states = MHLAModel(cfg, self.remat, name="model")(
            input_ids, states, use_cache, attention_mask, segment_ids
        )
        if output_hidden:
            # caller computes the loss via fused_linear_cross_entropy with
            # unembedding_weight(); logits are never materialized
            return x, new_states
        if cfg.tie_word_embeddings:
            emb = self.variables["params"]["model"]["embeddings"]["embedding"]
            logits = x @ emb.T.astype(x.dtype)
        else:
            logits = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=cfg.dtype, name="lm_head"
            )(x)
        return logits, new_states

    def init_states(self, batch_size: int) -> List[Any]:
        """Fresh decode states for every layer (None for softmax layers —
        their KV caches are allocated at prefill)."""
        cfg = self.config
        states = []
        for i in range(cfg.num_hidden_layers):
            if cfg.attn is not None and i in cfg.attn.get("layers", ()):
                states.append(None)
            else:
                states.append(None)
        return states


def unembedding_weight(params, config: MHLALMConfig) -> jax.Array:
    """[V, H] unembedding matrix for fused-linear-CE training."""
    if config.tie_word_embeddings:
        return params["params"]["model"]["embeddings"]["embedding"]
    return params["params"]["lm_head"]["kernel"].T


def fused_lm_loss(
    model, params, input_ids: jax.Array, ignore_index: int = -100,
    chunk_size: int = 4096,
) -> jax.Array:
    """Shifted LM loss without materializing logits
    (``fuse_linear_cross_entropy`` path, ``modeling_gla.py:396-397``)."""
    from ..ops.losses import fused_linear_cross_entropy

    hidden, _ = model.apply(params, input_ids, output_hidden=True)
    w = unembedding_weight(params, model.config)
    return fused_linear_cross_entropy(
        hidden[:, :-1], w, input_ids[:, 1:], chunk_size=chunk_size,
        ignore_index=ignore_index,
    )


def init_lm_params(params, config: MHLALMConfig, rng: jax.Array):
    """Apply the reference init scheme to a freshly-initialized param tree:
    normal(initializer_range) for all Dense kernels, then rescale
    o_proj/down_proj by 1/sqrt(2 * num_layers) (``modeling_gla.py:192-216``)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    scale = 1.0 / math.sqrt(2 * config.num_hidden_layers)
    new_leaves = []
    rngs = jax.random.split(rng, len(flat))
    for (path, leaf), r in zip(flat, rngs):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if names[-1] == "kernel" and leaf.ndim == 2:
            leaf = (
                jax.random.normal(r, leaf.shape, jnp.float32)
                * config.initializer_range
            ).astype(leaf.dtype)
            if any(n in ("o_proj", "down_proj") for n in names):
                leaf = leaf * scale
        new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, ignore_index: int = -100
) -> jax.Array:
    """Shifted LM cross-entropy (reference ``modeling_gla.py:396-403``):
    predict token t+1 from position t; ignore_index masked out."""
    logits = logits[:, :-1].astype(jnp.float32)
    labels = labels[:, 1:]
    mask = labels != ignore_index
    labels_safe = jnp.where(mask, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels_safe[..., None], axis=-1)[..., 0]
    nll = (logz - gold) * mask
    return nll.sum() / jnp.maximum(mask.sum(), 1)

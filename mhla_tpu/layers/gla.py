"""Gated Linear Attention layers: GLA (per-key low-rank gates) and
SimpleGLA (per-head scalar gates).

Re-designs of ``fla/layers/gla.py`` and ``fla/layers/simple_gla.py`` (the
``attn_extends in ('gla', 'simple_gla')`` LM baselines): q/k/v projections
with optional GQA, decay gates ``gk = logsigmoid(proj(x)) / 16`` (GLA uses a
low-rank two-layer gate head with bias, ``gla.py:153-154``; SimpleGLA a
single per-head projection, ``simple_gla.py:137``), chunked op for training
and the recurrent op for decode, fused RMSNorm+swish output gate.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import get_feature_map

# Honest-default policy (RESULTS.jsonl gla_32k at HEAD): the fused Pallas
# GLA kernel TIES the jnp chunk op on the training path (fwd+bwd 0.998x)
# and LOSES forward-only (0.755x — prefill), so the jnp op is the default;
# the fused kernels stay available for shapes where they win:
#   from ..kernels.gla_chunk_pallas import gla_chunk_fused as gla_chunk
from ..ops.gla_chunk import gla_chunk, gla_recurrent
from .norms import GatedRMSNorm, RMSNorm


class GLAState(NamedTuple):
    state: jax.Array  # [B, H, Dk, Dv] fp32


class GatedLinearAttention(nn.Module):
    hidden_size: int = 1024
    expand_k: float = 0.5
    expand_v: float = 1.0
    num_heads: int = 4
    num_kv_heads: Optional[int] = None
    feature_map: Optional[str] = None
    use_output_gate: bool = True
    gate_logit_normalizer: int = 16
    gate_low_rank_dim: int = 16
    clamp_min: Optional[float] = None
    elementwise_affine: bool = True
    norm_eps: float = 1e-5
    chunk_size: int = 64
    simple: bool = False  # True -> per-head scalar decay (SimpleGLA)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        state: Optional[GLAState] = None,
        use_cache: bool = False,
    ) -> Tuple[jax.Array, Optional[GLAState]]:
        b, t, _ = hidden_states.shape
        key_dim = int(self.hidden_size * self.expand_k)
        value_dim = int(self.hidden_size * self.expand_v)
        kv_heads = self.num_kv_heads or self.num_heads
        groups = self.num_heads // kv_heads
        head_k = key_dim // self.num_heads
        head_v = value_dim // self.num_heads

        dense = lambda nfeat, name, bias=False: nn.Dense(  # noqa: E731
            nfeat, use_bias=bias, dtype=self.dtype, name=name
        )
        q = dense(key_dim, "q_proj")(hidden_states)
        k = dense(key_dim // groups, "k_proj")(hidden_states)
        v = dense(value_dim // groups, "v_proj")(hidden_states)

        if self.simple:
            gk = dense(self.num_heads, "gk_proj", bias=False)(hidden_states)
            gk = jax.nn.log_sigmoid(gk.astype(jnp.float32))
        else:
            gk = dense(self.gate_low_rank_dim, "gk_proj_low")(hidden_states)
            gk = dense(key_dim // groups, "gk_proj_up", bias=True)(gk)
            gk = jax.nn.log_sigmoid(gk.astype(jnp.float32))
        gk = gk / self.gate_logit_normalizer
        if self.clamp_min is not None:
            gk = jnp.maximum(gk, self.clamp_min)

        q = q.reshape(b, t, self.num_heads, head_k)
        k = k.reshape(b, t, -1, head_k)
        v = v.reshape(b, t, -1, head_v)
        if not self.simple:
            gk = gk.reshape(b, t, -1, head_k)
        else:
            gk = gk.reshape(b, t, self.num_heads)
        if groups > 1:
            k = jnp.repeat(k, groups, axis=2)
            v = jnp.repeat(v, groups, axis=2)
            if not self.simple:
                gk = jnp.repeat(gk, groups, axis=2)

        fmap = get_feature_map(self.feature_map)
        q, k = fmap(q), fmap(k)

        init_s = state.state if state is not None else None
        if state is not None and t <= self.chunk_size:
            o, s = gla_recurrent(q, k, v, gk, init_s, output_final_state=use_cache)
        else:
            o, s = gla_chunk(
                q, k, v, gk, init_s, chunk_size=self.chunk_size,
                output_final_state=use_cache,
            )
        new_state = GLAState(state=s) if use_cache else None

        if self.use_output_gate:
            g = dense(value_dim, "g_proj")(hidden_states)
            g = g.reshape(b, t, self.num_heads, head_v)
            o = GatedRMSNorm(
                eps=self.norm_eps,
                elementwise_affine=self.elementwise_affine,
                name="g_norm_swish_gate",
            )(o, g)
        else:
            o = RMSNorm(
                eps=self.norm_eps,
                elementwise_affine=self.elementwise_affine,
                name="g_norm",
            )(o)
        o = o.reshape(b, t, value_dim)
        return dense(self.hidden_size, "o_proj")(o), new_state

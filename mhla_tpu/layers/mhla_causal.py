"""Causal MHLA attention layer (the LM attention module).

TPU-native re-design of the reference causal layer
(``mhla_nlp/fla/layers/mhla.py:29-365``): q/k/v(/g) projections with optional
GQA repeat and optional causal ShortConvolution, feature map (default relu)
applied per head, rotary applied after the feature map, a learned
lower-triangular chunk mixing matrix clamped to [1e-5, 1]*tril each forward,
the chunked MHLA op for training / recurrent op for decode (reference
switches at q_len <= 64, ``mhla.py:247``), and a fused RMSNorm+swish output
gate before the output projection.

State is threaded functionally (no in-place caches): ``MHLACausalState``
carries the chunk-state stack, the absolute position, and conv states.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    apply_rotary,
    clamp_causal_mixing_matrix,
    get_feature_map,
    init_causal_mixing_matrix,
    init_mhla_state,
    mhla_chunk,
    mhla_recurrent,
    rotary_cos_sin,
)
from ..ops.mhla_recurrent import MHLAState
from .norms import GatedRMSNorm, RMSNorm
from .short_conv import ShortConvolution


class MHLACausalState(NamedTuple):
    recurrent: MHLAState
    conv_q: Optional[jax.Array] = None
    conv_k: Optional[jax.Array] = None
    conv_v: Optional[jax.Array] = None


class MHLACausal(nn.Module):
    hidden_size: int = 1024
    expand_k: float = 0.5
    expand_v: float = 1.0
    num_heads: int = 4
    num_kv_heads: Optional[int] = None
    feature_map: Optional[str] = "relu"
    use_short_conv: bool = False
    conv_size: int = 4
    use_output_gate: bool = True
    elementwise_affine: bool = True
    norm_eps: float = 1e-5
    chunk_size: int = 64
    num_slots: int = 32  # mixing-matrix size; max ctx = num_slots * chunk_size
    mode: str = "chunk"
    rope_base: float = 10000.0
    dtype: jnp.dtype = jnp.float32

    @property
    def key_dim(self) -> int:
        return int(self.hidden_size * self.expand_k)

    @property
    def value_dim(self) -> int:
        return int(self.hidden_size * self.expand_v)

    def head_dims(self) -> Tuple[int, int]:
        return self.key_dim // self.num_heads, self.value_dim // self.num_heads

    def init_state(self, batch_size: int) -> MHLACausalState:
        head_k, head_v = self.head_dims()
        conv = (
            jnp.zeros((batch_size, self.conv_size - 1, self.key_dim), self.dtype)
            if self.use_short_conv
            else None
        )
        conv_kv_k = (
            jnp.zeros(
                (batch_size, self.conv_size - 1, self.key_dim // self._groups()),
                self.dtype,
            )
            if self.use_short_conv
            else None
        )
        conv_kv_v = (
            jnp.zeros(
                (batch_size, self.conv_size - 1, self.value_dim // self._groups()),
                self.dtype,
            )
            if self.use_short_conv
            else None
        )
        return MHLACausalState(
            recurrent=init_mhla_state(
                batch_size, self.num_heads, self.num_slots, head_k, head_v
            ),
            conv_q=conv,
            conv_k=conv_kv_k,
            conv_v=conv_kv_v,
        )

    def _groups(self) -> int:
        kv_heads = self.num_kv_heads or self.num_heads
        return self.num_heads // kv_heads

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,  # [B, T, hidden]
        state: Optional[MHLACausalState] = None,
        use_cache: bool = False,
        attention_mask: Optional[jax.Array] = None,  # [B, T] 1=real 0=pad
    ) -> Tuple[jax.Array, Optional[MHLACausalState]]:
        b, t, _ = hidden_states.shape
        head_k, head_v = self.head_dims()
        groups = self._groups()

        dense = lambda n, name: nn.Dense(  # noqa: E731
            n, use_bias=False, dtype=self.dtype, name=name
        )
        # all input projections as ONE concatenated matmul (batch-1 decode
        # is dispatch-bound; see layers/fused_dense.py) — the param tree is
        # identical to separate nn.Dense modules
        from .fused_dense import fused_projections

        proj_specs = [
            ("q_proj", self.key_dim),
            ("k_proj", self.key_dim // groups),
            ("v_proj", self.value_dim // groups),
        ]
        if self.use_output_gate:
            proj_specs.append(("g_proj", self.value_dim))
        projs = fused_projections(hidden_states, proj_specs, self.dtype)
        q, k, v = projs[0], projs[1], projs[2]
        g_raw = projs[3] if self.use_output_gate else None

        conv_q = conv_k = conv_v = None
        if self.use_short_conv:
            q, conv_q = ShortConvolution(
                self.key_dim, self.conv_size, activation="silu",
                dtype=self.dtype, name="q_conv1d",
            )(q, state.conv_q if state else None, use_cache)
            k, conv_k = ShortConvolution(
                self.key_dim // groups, self.conv_size, activation="silu",
                dtype=self.dtype, name="k_conv1d",
            )(k, state.conv_k if state else None, use_cache)
            v, conv_v = ShortConvolution(
                self.value_dim // groups, self.conv_size, activation="silu",
                dtype=self.dtype, name="v_conv1d",
            )(v, state.conv_v if state else None, use_cache)

        q = q.reshape(b, t, self.num_heads, head_k)
        k = k.reshape(b, t, -1, head_k)
        v = v.reshape(b, t, -1, head_v)
        if groups > 1:
            k = jnp.repeat(k, groups, axis=2)
            v = jnp.repeat(v, groups, axis=2)

        fmap = get_feature_map(self.feature_map)
        q, k = fmap(q), fmap(k)

        if attention_mask is not None:
            # TPU varlen stance (SURVEY.md section 7): static shapes + masking
            # instead of the reference's cu_seqlens unpadding. Zeroed k/v
            # contribute nothing to chunk states or intra-chunk attention,
            # so right-padded batches are exact.
            mask = attention_mask[..., None, None].astype(k.dtype)
            k = k * mask
            v = v * mask

        # rotary after the feature map (reference order, ``mhla.py:297-311``)
        max_len = self.num_slots * self.chunk_size
        cos, sin = rotary_cos_sin(max_len, head_k, self.rope_base, jnp.float32)
        offset = state.recurrent.t if state is not None else 0
        q = apply_rotary(q, cos, sin, offset=offset)
        k = apply_rotary(k, cos, sin, offset=offset)

        mixing = self.param(
            "mixing_matrix",
            lambda _rng, n: init_causal_mixing_matrix(n),
            self.num_slots,
        )
        mixing = clamp_causal_mixing_matrix(mixing)

        decode = state is not None and t <= self.chunk_size
        if decode or self.mode == "fused_recurrent":
            rec = state.recurrent if state is not None else None
            o, rec = mhla_recurrent(q, k, v, mixing, rec, chunk_size=self.chunk_size)
        else:
            # fused Pallas phase-C kernel on TPU; same math as ops.mhla_chunk
            from ..kernels import mhla_chunk_fused

            o, states = mhla_chunk_fused(
                q, k, v, mixing, chunk_size=self.chunk_size,
                output_final_state=use_cache,
            )
            rec = None
            if use_cache:
                from ..ops.mhla_recurrent import state_from_chunk

                rec = state_from_chunk(
                    states, t, mixing,
                    chunk_size=self.chunk_size, num_slots=self.num_slots,
                )

        new_state = None
        if use_cache:
            new_state = MHLACausalState(
                recurrent=rec, conv_q=conv_q, conv_k=conv_k, conv_v=conv_v
            )

        if self.use_output_gate:
            g = g_raw.reshape(b, t, self.num_heads, head_v)
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
        o = o.reshape(b, t, self.value_dim)
        o = dense(self.hidden_size, "o_proj")(o)
        return o, new_state

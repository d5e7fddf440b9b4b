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

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    clamp_causal_mixing_matrix,
    get_feature_map,
    init_causal_mixing_matrix,
    init_mhla_state,
    mhla_recurrent,
    rotary_cos_sin,
)
from ..ops.mhla_recurrent import MHLAState
from ..ops.rotary import apply_rotary_flat
from .norms import GatedRMSNormHeadsFlat, RMSNormHeadsFlat
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
    # XPos (fla ``RotaryEmbedding(scale_base=...)``): positional decay baked
    # into the rotary tables — q gets scale, k gets 1/scale (ops.rotary).
    rope_scale_base: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    # head-axis tensor parallelism: a jax.sharding.Mesh with a 'tensor' axis
    # of size > 1 routes the chunk path through one shard_map (heads are
    # independent — zero collectives inside the op; parallel.tensor_parallel)
    tp_mesh: Optional[Any] = None

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
        segment_ids: Optional[jax.Array] = None,  # [B, T] packed-varlen docs
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
            # segment_ids reset the conv at document boundaries (reference:
            # cu_seqlens into ShortConvolution, ``fla/layers/mhla.py:262-279``)
            q, conv_q = ShortConvolution(
                self.key_dim, self.conv_size, activation="silu",
                dtype=self.dtype, name="q_conv1d",
            )(q, state.conv_q if state else None, use_cache, segment_ids)
            k, conv_k = ShortConvolution(
                self.key_dim // groups, self.conv_size, activation="silu",
                dtype=self.dtype, name="k_conv1d",
            )(k, state.conv_k if state else None, use_cache, segment_ids)
            v, conv_v = ShortConvolution(
                self.value_dim // groups, self.conv_size, activation="silu",
                dtype=self.dtype, name="v_conv1d",
            )(v, state.conv_v if state else None, use_cache, segment_ids)

        # Head-flat stance (CLAUDE.md / VERDICT r2 #1): q/k/v stay in the
        # projection-natural [B, T, H*D] layout through GQA expansion,
        # feature map, masking, rotary, the fused chunk kernel, and the
        # per-head output norm — every [B,T,H,D] view is a real TPU
        # tile-relayout copy, so only the (tiny) decode path pays one.
        if groups > 1:
            # repeat(x, g, axis=head) on the flat layout = one skinny 0/1
            # segment matmul (MXU, tiling preserved) instead of a relayout
            kv_heads = self.num_heads // groups
            exp_k = _gqa_expand(k.shape[-1], k.shape[-1] // kv_heads, groups, k.dtype)
            k = jnp.einsum("btf,fg->btg", k, exp_k)
            exp_v = _gqa_expand(v.shape[-1], v.shape[-1] // kv_heads, groups, v.dtype)
            v = jnp.einsum("btf,fg->btg", v, exp_v)

        fmap_name = self.feature_map
        flat_fmap_ok = fmap_name in (None, "relu", "elu", "identity", "t2r")
        fmap = get_feature_map(fmap_name)
        if not flat_fmap_ok:
            # head-axis-dependent maps (softmax/exp/dpfp) need the 4D view
            q = fmap(q.reshape(b, t, self.num_heads, head_k)).reshape(b, t, -1)
            k = fmap(k.reshape(b, t, self.num_heads, head_k)).reshape(b, t, -1)

        if attention_mask is not None:
            # TPU varlen stance (SURVEY.md section 7): static shapes + masking
            # instead of the reference's cu_seqlens unpadding. Zeroed k/v
            # contribute nothing to chunk states or intra-chunk attention,
            # so right-padded batches are exact. (The mask commutes with the
            # per-token rope rotation and the elementwise feature map.)
            mask = attention_mask[..., None].astype(k.dtype)
            k = k * mask
            v = v * mask

        # feature map + rotary after it (reference order, ``mhla.py:297-311``)
        # fused into one Pallas pass on flat rows (kernels.fused_fmap_rope)
        max_len = self.num_slots * self.chunk_size
        offset = state.recurrent.t if state is not None else 0
        if self.rope_scale_base is not None:
            from ..ops.rotary import rotary_xpos_tables

            cos, sin, cos_k, sin_k = rotary_xpos_tables(
                max_len, head_k, self.rope_base, self.rope_scale_base,
                jnp.float32,
            )
        else:
            cos, sin = rotary_cos_sin(
                max_len, head_k, self.rope_base, jnp.float32
            )
            cos_k, sin_k = cos, sin
        from ..kernels import fused_fmap_rope_flat

        positions = None
        if segment_ids is not None:
            # packed varlen: rotary positions restart at each document
            from ..ops.mhla_chunk import segment_positions

            positions = segment_positions(segment_ids)
        fm = fmap_name if flat_fmap_ok else None

        decode = state is not None and t <= self.chunk_size
        tp = (
            self.tp_mesh is not None
            and dict(self.tp_mesh.shape).get("tensor", 1) > 1
            and not (decode or self.mode == "fused_recurrent")
        )
        if not tp:
            q = fused_fmap_rope_flat(
                q, cos, sin, self.num_heads, fm, offset=offset,
                positions=positions,
            )
            k = fused_fmap_rope_flat(
                k, cos_k, sin_k, self.num_heads, fm, offset=offset,
                positions=positions,
            )

        mixing = self.param(
            "mixing_matrix",
            lambda _rng, n: init_causal_mixing_matrix(n),
            self.num_slots,
        )
        mixing = clamp_causal_mixing_matrix(mixing)

        if decode or self.mode == "fused_recurrent":
            if segment_ids is not None:
                raise ValueError(
                    "segment_ids (packed varlen) is a training-path feature; "
                    "the recurrent decode path carries one document per row"
                )
            rec = state.recurrent if state is not None else None
            o4, rec = mhla_recurrent(
                q.reshape(b, t, self.num_heads, head_k),
                k.reshape(b, t, self.num_heads, head_k),
                v.reshape(b, t, self.num_heads, head_v),
                mixing, rec, chunk_size=self.chunk_size,
            )
            o = o4.reshape(b, t, self.value_dim)
        elif tp:
            # head-axis TP: fmap+rope+chunk as one shard_map over the
            # 'tensor' axis — GSPMD can't split the Pallas custom calls,
            # each device runs them on its local head slice
            from ..parallel.tensor_parallel import mhla_attention_tp_flat

            o, states = mhla_attention_tp_flat(
                q, k, v, mixing, cos, sin, self.num_heads, self.tp_mesh,
                feature_map=fm, chunk_size=self.chunk_size,
                positions=positions, segment_ids=segment_ids,
                output_final_state=use_cache, cos_k=cos_k, sin_k=sin_k,
            )
            rec = None
            if use_cache:
                from ..ops.mhla_recurrent import state_from_chunk

                rec = state_from_chunk(
                    states, t, mixing,
                    chunk_size=self.chunk_size, num_slots=self.num_slots,
                )
        else:
            # fused Pallas kernels, zero-relayout entry (same math as
            # ops.mhla_chunk; kernels/mhla_chunk_pallas.py:684-690)
            from ..kernels import mhla_chunk_fused_flat

            o, states = mhla_chunk_fused_flat(
                q, k, v, mixing, num_heads=self.num_heads,
                chunk_size=self.chunk_size, output_final_state=use_cache,
                segment_ids=segment_ids,
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
            o = GatedRMSNormHeadsFlat(
                num_heads=self.num_heads,
                eps=self.norm_eps,
                elementwise_affine=self.elementwise_affine,
                name="g_norm_swish_gate",
            )(o, g_raw)
        else:
            o = RMSNormHeadsFlat(
                num_heads=self.num_heads,
                eps=self.norm_eps,
                elementwise_affine=self.elementwise_affine,
                name="g_norm",
            )(o)
        o = dense(self.hidden_size, "o_proj")(o)
        return o, new_state


def _gqa_expand(kv_dim: int, dh: int, groups: int, dtype) -> jax.Array:
    """0/1 matrix [kv_dim, kv_dim*groups] mapping head-flat kv features to
    the grouped-repeat layout ([kv0, kv0, ..., kv1, kv1, ...] — the same
    order as ``jnp.repeat(k4, groups, axis=2)`` on the [B,T,KVH,Dh] view)."""
    src = jnp.arange(kv_dim)
    dst = jnp.arange(kv_dim * groups)
    src_head, src_off = src // dh, src % dh
    dst_head, dst_off = dst // dh, dst % dh
    return (
        (src_head[:, None] == dst_head[None, :] // groups)
        & (src_off[:, None] == dst_off[None, :])
    ).astype(dtype)

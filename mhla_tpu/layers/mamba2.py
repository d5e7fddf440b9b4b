"""Mamba2 layer (SSD), built on the scalar-decay chunked linear-attention op.

The reference ships mamba/mamba2 model families
(``mhla_nlp/fla/models/{mamba,mamba2}``, CUDA/Triton selective-scan kernels).
By the SSD duality (Mamba2 paper), the selective state space with scalar
per-head decay IS gated linear attention with:

    q_t = C_t (shared across heads),  k_t = B_t (shared),
    v_t = dt_t * x_t (per-head values),  gk_t = -exp(A_log) * dt_t (scalar)

so this layer reuses :func:`mhla_tpu.ops.gla_chunk.gla_chunk` — the same
chunked inter/intra decomposition the fused CUDA kernels implement — plus
the Mamba2 dressing: fused input projection, causal conv on (x, B, C),
softplus dt with bias, D skip connection, and gated RMSNorm output.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# jnp chunk op is the honest default — see the note in layers/gla.py
# (fused kernel ties fwd+bwd, loses forward-only at the 32k bench)
from ..ops.gla_chunk import gla_chunk, gla_recurrent
from .gated_deltanet import _a_log_init, _dt_bias_init
from .norms import GatedRMSNorm
from .short_conv import ShortConvolution


class Mamba2State(NamedTuple):
    state: jax.Array  # [B, H, d_state, head_dim]
    conv: Optional[jax.Array] = None


class Mamba2(nn.Module):
    hidden_size: int = 1024
    expand: int = 2
    head_dim: int = 64
    d_state: int = 128
    conv_size: int = 4
    chunk_size: int = 64
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        state: Optional[Mamba2State] = None,
        use_cache: bool = False,
    ) -> Tuple[jax.Array, Optional[Mamba2State]]:
        b, t, _ = hidden_states.shape
        d_inner = self.expand * self.hidden_size
        h = d_inner // self.head_dim

        # fused input projection: [z, x, B, C, dt]
        proj = nn.Dense(
            2 * d_inner + 2 * self.d_state + h,
            use_bias=False, dtype=self.dtype, name="in_proj",
        )(hidden_states)
        z, xbc_dt = jnp.split(proj, [d_inner], axis=-1)
        xbc, dt_raw = jnp.split(xbc_dt, [d_inner + 2 * self.d_state], axis=-1)

        # causal conv over the concatenated (x, B, C) stream
        xbc, conv_state = ShortConvolution(
            d_inner + 2 * self.d_state, self.conv_size, activation="silu",
            dtype=self.dtype, name="conv1d",
        )(xbc, state.conv if state else None, use_cache)
        x, bc = jnp.split(xbc, [d_inner], axis=-1)
        b_in, c_in = jnp.split(bc, 2, axis=-1)

        a_log = self.param("A_log", _a_log_init, (h,))
        dt_bias = self.param("dt_bias", _dt_bias_init, (h,))
        dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + dt_bias)  # [B, T, H]
        gk = -jnp.exp(a_log) * dt  # scalar log-decay per head

        # SSD -> GLA mapping: B/C shared across heads (ngroups=1)
        q = jnp.repeat(c_in[:, :, None, :], h, axis=2)  # [B, T, H, d_state]
        k = jnp.repeat(b_in[:, :, None, :], h, axis=2)
        v = x.reshape(b, t, h, self.head_dim) * dt[..., None].astype(x.dtype)

        init_s = state.state if state is not None else None
        # gla ops scale q by d_state**-0.5; SSD uses unscaled C — pre-undo
        q = q * (self.d_state**0.5)
        if state is not None and t <= self.chunk_size:
            y, s = gla_recurrent(q, k, v, gk, init_s, output_final_state=use_cache)
        else:
            y, s = gla_chunk(
                q, k, v, gk, init_s, chunk_size=self.chunk_size,
                output_final_state=use_cache,
            )

        # D skip connection
        d_skip = self.param("D", nn.initializers.ones, (h,), jnp.float32)
        y = y + x.reshape(b, t, h, self.head_dim) * d_skip[None, None, :, None].astype(
            x.dtype
        )

        y = GatedRMSNorm(eps=self.norm_eps, name="norm")(
            y, z.reshape(b, t, h, self.head_dim)
        )
        y = y.reshape(b, t, d_inner)
        out = nn.Dense(
            self.hidden_size, use_bias=False, dtype=self.dtype, name="out_proj"
        )(y)
        new_state = Mamba2State(state=s, conv=conv_state) if use_cache else None
        return out, new_state

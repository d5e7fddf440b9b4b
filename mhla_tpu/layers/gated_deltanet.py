"""Gated DeltaNet layer (reference ``fla/layers/gated_deltanet.py``).

q/k/v projections with causal ShortConvolutions (silu), L2-normalized q/k,
mamba2-style gating head: ``g = -exp(A_log) * softplus(a_proj(x) + dt_bias)``
(A ~ U(0, 16), dt log-uniform in [1e-3, 0.1]; both no-weight-decay, reference
:149-170), ``beta = sigmoid(b_proj(x))`` (x2 when ``allow_neg_eigval``),
delta-rule recurrence, fused RMSNorm+swish output gate.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.delta_rule import gated_delta_chunk, gated_delta_recurrent
from .norms import GatedRMSNorm, RMSNorm
from .short_conv import ShortConvolution


class DeltaNetState(NamedTuple):
    state: jax.Array  # [B, H, Dk, Dv]
    conv_q: Optional[jax.Array] = None
    conv_k: Optional[jax.Array] = None
    conv_v: Optional[jax.Array] = None


def _a_log_init(key, shape, dtype=jnp.float32):
    return jnp.log(jax.random.uniform(key, shape, dtype, 1e-4, 16.0))


def _dt_bias_init(key, shape, dtype=jnp.float32):
    dt = jnp.exp(
        jax.random.uniform(key, shape, dtype)
        * (math.log(0.1) - math.log(0.001))
        + math.log(0.001)
    )
    dt = jnp.clip(dt, min=1e-4)
    # inverse softplus so softplus(dt_bias) == dt at init
    return dt + jnp.log(-jnp.expm1(-dt))


class GatedDeltaNet(nn.Module):
    hidden_size: int = 1024
    head_dim: int = 128
    num_heads: int = 8
    expand_v: float = 1.0
    use_gate: bool = True
    use_short_conv: bool = True
    conv_size: int = 4
    allow_neg_eigval: bool = False
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        state: Optional[DeltaNetState] = None,
        use_cache: bool = False,
    ) -> Tuple[jax.Array, Optional[DeltaNetState]]:
        b, t, _ = hidden_states.shape
        h = self.num_heads
        dk = self.head_dim
        dv = int(self.head_dim * self.expand_v)
        key_dim, value_dim = h * dk, h * dv

        dense = lambda n, name: nn.Dense(  # noqa: E731
            n, use_bias=False, dtype=self.dtype, name=name
        )
        q = dense(key_dim, "q_proj")(hidden_states)
        k = dense(key_dim, "k_proj")(hidden_states)
        v = dense(value_dim, "v_proj")(hidden_states)

        conv_q = conv_k = conv_v = None
        if self.use_short_conv:
            q, conv_q = ShortConvolution(
                key_dim, self.conv_size, activation="silu", dtype=self.dtype,
                name="q_conv1d",
            )(q, state.conv_q if state else None, use_cache)
            k, conv_k = ShortConvolution(
                key_dim, self.conv_size, activation="silu", dtype=self.dtype,
                name="k_conv1d",
            )(k, state.conv_k if state else None, use_cache)
            v, conv_v = ShortConvolution(
                value_dim, self.conv_size, activation="silu", dtype=self.dtype,
                name="v_conv1d",
            )(v, state.conv_v if state else None, use_cache)

        # decay + delta-strength heads
        a = dense(h, "a_proj")(hidden_states).astype(jnp.float32)
        a_log = self.param("A_log", _a_log_init, (h,))
        dt_bias = self.param("dt_bias", _dt_bias_init, (h,))
        g = -jnp.exp(a_log) * jax.nn.softplus(a + dt_bias)
        beta = jax.nn.sigmoid(dense(h, "b_proj")(hidden_states).astype(jnp.float32))
        if self.allow_neg_eigval:
            beta = beta * 2.0

        q = q.reshape(b, t, h, dk)
        k = k.reshape(b, t, h, dk)
        v = v.reshape(b, t, h, dv)

        init_s = state.state if state is not None else None
        if t <= 64:  # decode/short-prefill: exact token recurrence
            o, s = gated_delta_recurrent(
                q, k, v, g, beta,
                initial_state=init_s, output_final_state=use_cache,
            )
        else:  # chunked WY form (fused Pallas forward on TPU; the jnp op
            # is the semantic anchor and the fallback off-TPU)
            from ..kernels.delta_chunk_pallas import gated_delta_chunk_fused

            o, s = gated_delta_chunk_fused(
                q, k, v, g, beta,
                initial_state=init_s, output_final_state=use_cache,
            )
        new_state = (
            DeltaNetState(state=s, conv_q=conv_q, conv_k=conv_k, conv_v=conv_v)
            if use_cache
            else None
        )

        if self.use_gate:
            gate = dense(value_dim, "g_proj")(hidden_states).reshape(b, t, h, dv)
            o = GatedRMSNorm(eps=self.norm_eps, name="o_norm")(o, gate)
        else:
            o = RMSNorm(eps=self.norm_eps, name="o_norm")(o)
        o = o.reshape(b, t, value_dim)
        return dense(self.hidden_size, "o_proj")(o), new_state

"""Gated delta rule op (DeltaNet with scalar forget gates).

Baseline family shipped by the reference (``fla/ops/gated_delta_rule``,
semantics from the self-contained fused recurrent kernel
``fused_recurrent.py:23-353``): per token, with state S [Dk, Dv],

    S  *= exp(g_t)                      # scalar per-head log decay
    v'  = beta_t * (v_t - S^T k_t)      # delta rule replacement
    S  += k_t v'^T
    o_t = (q_t * Dk**-0.5) S

q/k are L2-normalized (``use_qk_l2norm_in_kernel``). Expressed as a
``lax.scan`` over tokens (the recurrence is inherently sequential in the
delta term); chunk-level parallelism (the WY-representation kernel) is a
future optimization — this form is exact and trains via scan autodiff.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + eps)


@partial(jax.jit, static_argnames=("output_final_state", "use_qk_l2norm"))
def gated_delta_recurrent(
    q: jax.Array,  # [B, T, H, Dk]
    k: jax.Array,  # [B, T, H, Dk]
    v: jax.Array,  # [B, T, H, Dv]
    g: jax.Array,  # [B, T, H] log decay (<= 0)
    beta: jax.Array,  # [B, T, H] in (0, 1) (or (0, 2) with neg eigval)
    initial_state: Optional[jax.Array] = None,
    output_final_state: bool = False,
    use_qk_l2norm: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    in_dtype = q.dtype
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    scale = dk**-0.5
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    g = g.astype(jnp.float32)
    beta = beta.astype(jnp.float32)
    if use_qk_l2norm:
        q, k = l2norm(q), l2norm(k)

    s0 = (
        initial_state.astype(jnp.float32)
        if initial_state is not None
        else jnp.zeros((b, h, dk, dv), jnp.float32)
    )

    def step(s, xs):
        q_t, k_t, v_t, g_t, b_t = xs  # [B, H, *]
        s = s * jnp.exp(g_t)[..., None, None]
        v_old = jnp.einsum("bhkv,bhk->bhv", s, k_t)
        v_new = b_t[..., None] * (v_t - v_old)
        s = s + jnp.einsum("bhk,bhv->bhkv", k_t, v_new)
        o_t = jnp.einsum("bhk,bhkv->bhv", q_t * scale, s)
        return s, o_t

    xs = (
        q.transpose(1, 0, 2, 3),
        k.transpose(1, 0, 2, 3),
        v.transpose(1, 0, 2, 3),
        g.transpose(1, 0, 2),
        beta.transpose(1, 0, 2),
    )
    s, o = jax.lax.scan(step, s0, xs)
    o = o.transpose(1, 0, 2, 3).astype(in_dtype)
    return o, (s if output_final_state else None)

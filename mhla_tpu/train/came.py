"""CAME optimizer (Confidence-guided Adaptive Memory Efficient optimizer).

optax implementation of the reference's CAME (``diffusion/utils/optimizer.py:37-799``
ships CAME + 8-bit CAME as the video-training optimizer; CAME: Luo et al.,
ACL 2023). Memory-efficient Adafactor-style second moment (row/col factored
for matrices) plus confidence-guided updates:

    m_t   = b1 m_{t-1} + (1-b1) g
    v_t   = b2 v_{t-1} + (1-b2) g^2          (factored for ndim>=2)
    u_t   = g / sqrt(v_t)          (clipped by RMS)
    r_t   = b3 r_{t-1} + (1-b3) (m_t - u_t)^2   (confidence, factored)
    update = m_t / sqrt(r_t)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class CAMEState(NamedTuple):
    count: jax.Array
    m: optax.Updates
    v_row: optax.Updates  # factored second moments (or full for vectors)
    v_col: optax.Updates
    r_row: optax.Updates
    r_col: optax.Updates


def _factored(p) -> bool:
    return p.ndim >= 2


def came(
    learning_rate: optax.ScalarOrSchedule,
    beta1: float = 0.9,
    beta2: float = 0.999,
    beta3: float = 0.9999,
    eps1: float = 1e-30,
    eps2: float = 1e-16,
    clip_threshold: float = 1.0,
    weight_decay: float = 0.0,
    quantize_m: bool = False,
) -> optax.GradientTransformation:
    """``quantize_m=True`` stores the full-size first moment in blockwise
    int8 (the reference's bitsandbytes CAME8bit; the factored v/r states are
    already tiny and stay fp32)."""
    if quantize_m:
        from .optim8bit import Quant8, _dq, _q

    def _store_m(x):
        return _q(x, True) if quantize_m else x

    def _load_m(m, shape):
        return _dq(m, shape) if quantize_m else m

    def init_fn(params):
        def zeros_like_factored(p, row: bool):
            if _factored(p):
                shape = p.shape[:-1] if row else p.shape[:-2] + p.shape[-1:]
                return jnp.zeros(shape, jnp.float32)
            return jnp.zeros_like(p, jnp.float32) if row else jnp.zeros((), jnp.float32)

        return CAMEState(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree.map(
                lambda p: _store_m(jnp.zeros(p.shape, jnp.float32)), params
            ),
            v_row=jax.tree.map(lambda p: zeros_like_factored(p, True), params),
            v_col=jax.tree.map(lambda p: zeros_like_factored(p, False), params),
            r_row=jax.tree.map(lambda p: zeros_like_factored(p, True), params),
            r_col=jax.tree.map(lambda p: zeros_like_factored(p, False), params),
        )

    def _approx(row, col):
        """Factored second-moment approximation (Adafactor)."""
        r = row / jnp.clip(jnp.mean(row, axis=-1, keepdims=True), min=eps1)
        return r[..., None] * col[..., None, :]

    def update_fn(grads, state, params=None):
        count = state.count + 1

        def per_param(m, g, vr, vc, rr, rc, p):
            g = g.astype(jnp.float32)
            m = _load_m(m, g.shape)
            if _factored(g):
                g2 = g * g + eps1
                vr = beta2 * vr + (1 - beta2) * jnp.mean(g2, axis=-1)
                vc = beta2 * vc + (1 - beta2) * jnp.mean(g2, axis=-2)
                u = g * jax.lax.rsqrt(_approx(vr, vc))
            else:
                vr = beta2 * vr + (1 - beta2) * (g * g + eps1)
                vc = rc  # unused scalar
                u = g * jax.lax.rsqrt(vr)
            # RMS clip
            rms = jnp.sqrt(jnp.mean(u * u))
            u = u / jnp.maximum(1.0, rms / clip_threshold)
            m_new = beta1 * m + (1 - beta1) * u
            if _factored(g):
                res = (u - m_new) ** 2 + eps2
                rr = beta3 * rr + (1 - beta3) * jnp.mean(res, axis=-1)
                rc = beta3 * rc + (1 - beta3) * jnp.mean(res, axis=-2)
                upd = m_new * jax.lax.rsqrt(_approx(rr, rc))
            else:
                rr = beta3 * rr + (1 - beta3) * ((u - m_new) ** 2 + eps2)
                upd = m_new * jax.lax.rsqrt(rr)
            return upd.astype(g.dtype), _store_m(m_new), vr, vc, rr, rc

        # state.m leads the map so its Quant8 leaves terminate traversal
        flat = jax.tree.map(
            per_param, state.m, grads, state.v_row, state.v_col,
            state.r_row, state.r_col,
            params if params is not None else grads,
            is_leaf=lambda x: quantize_m
            and type(x).__name__ == "Quant8",
        )
        updates = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
        m = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
        vr = jax.tree.map(lambda t: t[2], flat, is_leaf=lambda x: isinstance(x, tuple))
        vc = jax.tree.map(lambda t: t[3], flat, is_leaf=lambda x: isinstance(x, tuple))
        rr = jax.tree.map(lambda t: t[4], flat, is_leaf=lambda x: isinstance(x, tuple))
        rc = jax.tree.map(lambda t: t[5], flat, is_leaf=lambda x: isinstance(x, tuple))

        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def final(u, p):
            out = u
            if weight_decay > 0 and params is not None and p.ndim >= 2:
                out = out + weight_decay * p.astype(jnp.float32)
            return (-lr * out).astype(p.dtype if params is not None else out.dtype)

        updates = jax.tree.map(
            final, updates, params if params is not None else updates
        )
        return updates, CAMEState(count, m, vr, vc, rr, rc)

    return optax.GradientTransformation(init_fn, update_fn)

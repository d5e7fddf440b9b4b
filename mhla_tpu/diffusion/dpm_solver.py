"""DPM-Solver++ (multistep, order 1/2) for flow-matching and eps models.

Re-design of the reference video sampler (``diffusion/model/dpm_solver.py``,
driven as ``DPMS(model, condition, uncondition, cfg_scale).sample(steps,
order=2, multistep)`` from ``inference.py:290-303``): data-prediction
DPM-Solver++(2M) on the half-logSNR grid, with classifier-free guidance
folded into the model call (cond/uncond batched, like the reference wrapper).

Schedules:
- ``flow``: linear rectified flow, alpha_t = 1-t, sigma_t = t (Wan training
  target ``velocity = noise - x_start``; data prediction x0 = x_t - t*v)
- ``discrete``: DDPM alphas_cumprod grid with eps prediction

The whole sampler is one ``lax.scan`` program.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _flow_grid(num_steps: int, shift: float = 1.0, t_start=1.0, t_end=1e-3):
    t = np.linspace(t_start, t_end, num_steps + 1)
    if shift != 1.0:  # timestep shift (reference flow_shift)
        t = shift * t / (1 + (shift - 1) * t)
    return t


def dpm_solver_pp(
    model_x0: Callable[[jax.Array, jax.Array], jax.Array],
    x: jax.Array,
    num_steps: int = 20,
    order: int = 2,
    shift: float = 1.0,
) -> jax.Array:
    """Multistep DPM-Solver++ in data-prediction form over the flow schedule.

    ``model_x0(x_t, t)`` must return the data (x0) prediction at continuous
    time t in (0, 1]; use :func:`flow_velocity_to_x0` for velocity models.
    """
    ts = jnp.asarray(_flow_grid(num_steps, shift), jnp.float32)
    alphas = 1.0 - ts
    sigmas = ts
    lambdas = jnp.log(jnp.clip(alphas, 1e-6)) - jnp.log(jnp.clip(sigmas, 1e-6))

    def body(carry, i):
        x, x0_prev, valid_prev = carry
        t_cur, t_next = ts[i], ts[i + 1]
        x0 = model_x0(x, jnp.full((x.shape[0],), t_cur, jnp.float32))
        x0 = x0.astype(jnp.float32)

        h = lambdas[i + 1] - lambdas[i]
        # second-order multistep correction when a previous estimate exists
        if order >= 2:
            h_prev = lambdas[i] - lambdas[jnp.maximum(i - 1, 0)]
            r = h_prev / jnp.maximum(h, 1e-8)
            d = jnp.where(
                valid_prev & (i > 0),
                (1 + 1 / (2 * jnp.maximum(r, 1e-8))) * x0
                - (1 / (2 * jnp.maximum(r, 1e-8))) * x0_prev,
                x0,
            )
        else:
            d = x0
        x_next = (
            sigmas[i + 1] / jnp.maximum(sigmas[i], 1e-8) * x
            - alphas[i + 1] * jnp.expm1(-h) * d
        )
        return (x_next, x0, jnp.asarray(True)), None

    init = (x.astype(jnp.float32), jnp.zeros_like(x, jnp.float32), jnp.asarray(False))
    (x, _, _), _ = jax.lax.scan(body, init, jnp.arange(num_steps))
    return x


def flow_velocity_to_x0(
    velocity_model: Callable[[jax.Array, jax.Array], jax.Array]
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Wrap a flow-velocity model into a data-prediction model:
    x0 = x_t - t * v(x_t, t)."""

    def x0_model(x_t, t):
        v = velocity_model(x_t, t)
        tt = t.reshape(t.shape + (1,) * (x_t.ndim - 1))
        return x_t.astype(jnp.float32) - tt * v.astype(jnp.float32)

    return x0_model


def with_cfg(
    model: Callable[..., jax.Array],
    cond,
    uncond,
    cfg_scale: float,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Fold classifier-free guidance into a model callable, batching the
    cond/uncond passes like the reference DPMS wrapper."""

    def guided(x_t, t):
        x2 = jnp.concatenate([x_t, x_t], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        c2 = jax.tree.map(
            lambda c, u: jnp.concatenate([c, u], axis=0), cond, uncond
        )
        out = model(x2, t2, c2)
        out_c, out_u = jnp.split(out, 2, axis=0)
        return out_u + cfg_scale * (out_c - out_u)

    return guided

"""Latent Consistency Model (LCM) sampler.

TPU-native re-design of the reference's diffusers-style ``LCMScheduler``
(``mhla_videogen/diffusion/scheduler/lcm_scheduler.py:121-456``): instead of
a stateful scheduler object with a per-step ``step()`` method, the whole
multi-step LCM sampling chain is one ``lax.scan`` program (one XLA
compilation, no host round-trips per step).

Semantics matched to the reference:
- timestep schedule (``set_timesteps`` :287-311): the LCM *training*
  schedule is ``lcm_origin_steps`` evenly spaced train timesteps
  ``(i+1) * (T // lcm_origin_steps) - 1``; inference takes every
  ``len // num_steps``-th of those, descending;
- boundary-condition scalings (:312-318): ``c_skip``/``c_out`` with
  sigma_data = 0.5 and the t/0.1 sharpening;
- step (:320-410): pred_x0 from epsilon / sample / v parameterizations,
  ``denoised = c_out * pred_x0 + c_skip * sample``, then for multi-step
  re-noise to the previous schedule point
  ``sqrt(a_prev) * denoised + sqrt(1 - a_prev) * z``; the final step
  returns ``denoised`` un-noised.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian_diffusion import make_beta_schedule

SIGMA_DATA = 0.5  # reference :313


def lcm_timesteps(
    num_inference_steps: int,
    lcm_origin_steps: int = 50,
    num_train_timesteps: int = 1000,
) -> np.ndarray:
    """Descending int train-timestep schedule (reference :303-310)."""
    c = num_train_timesteps // lcm_origin_steps
    origin = np.arange(1, lcm_origin_steps + 1) * c - 1
    skip = len(origin) // num_inference_steps
    return origin[::-skip][:num_inference_steps].copy()


def lcm_boundary_scalings(t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(c_skip, c_out) at train timestep t (reference :312-318)."""
    ts = t.astype(jnp.float32) / 0.1
    c_skip = SIGMA_DATA**2 / (ts**2 + SIGMA_DATA**2)
    c_out = ts / jnp.sqrt(ts**2 + SIGMA_DATA**2)
    return c_skip, c_out


def lcm_sample_loop(
    model: Callable,
    shape: Sequence[int],
    rng: jax.Array,
    num_steps: int = 4,
    lcm_origin_steps: int = 50,
    num_train_timesteps: int = 1000,
    beta_schedule: str = "scaled_linear",
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
    prediction_type: str = "epsilon",
    model_kwargs: Optional[dict] = None,
    noise: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-step LCM sampling as one ``lax.scan``.

    ``model(x, t_batch, **kwargs)`` consumes integer train timesteps
    (matching the reference's guided-distillation consumer). Returns the
    final ``denoised`` prediction (the last step is not re-noised,
    reference :400-404).
    """
    model_kwargs = model_kwargs or {}
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(
            beta_start, beta_end, num_train_timesteps, dtype=np.float64
        )
    else:
        betas = make_beta_schedule(beta_schedule, num_train_timesteps)
    alphas_cumprod = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)

    ts = lcm_timesteps(num_steps, lcm_origin_steps, num_train_timesteps)
    # prev_timestep at the last index is the timestep itself (reference
    # :357-361); alpha_prev is then unused because the last step returns
    # ``denoised`` directly.
    ts_prev = np.concatenate([ts[1:], ts[-1:]])
    ts_j = jnp.asarray(ts, jnp.int32)
    ts_prev_j = jnp.asarray(ts_prev, jnp.int32)

    x = (
        noise
        if noise is not None
        else jax.random.normal(rng, tuple(shape), jnp.float32)
    )
    multistep = num_steps > 1

    def body(carry, i):
        x, step_rng = carry
        t = ts_j[i]
        t_prev = ts_prev_j[i]
        a_t = alphas_cumprod[t]
        a_prev = alphas_cumprod[t_prev]
        t_b = jnp.full((shape[0],), t, jnp.int32)
        out = model(x, t_b, **model_kwargs).astype(jnp.float32)
        if prediction_type == "epsilon":
            pred_x0 = (x - jnp.sqrt(1 - a_t) * out) / jnp.sqrt(a_t)
        elif prediction_type == "sample":
            pred_x0 = out
        elif prediction_type == "v_prediction":
            pred_x0 = jnp.sqrt(a_t) * x - jnp.sqrt(1 - a_t) * out
        else:
            raise ValueError(f"unknown prediction_type {prediction_type}")
        c_skip, c_out = lcm_boundary_scalings(t)
        denoised = c_out * pred_x0 + c_skip * x
        if multistep:
            step_rng, sub = jax.random.split(step_rng)
            z = jax.random.normal(sub, x.shape, jnp.float32)
            renoised = jnp.sqrt(a_prev) * denoised + jnp.sqrt(1 - a_prev) * z
            # the LAST step returns denoised un-noised
            x_next = jnp.where(i == num_steps - 1, denoised, renoised)
        else:
            x_next = denoised
        return (x_next, step_rng), None

    (x, _), _ = jax.lax.scan(body, (x, rng), jnp.arange(num_steps))
    return x

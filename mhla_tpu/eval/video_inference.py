"""Video inference: DPM-Solver++ / FlowEuler sampling with CFG
(``mhla_videogen/inference.py`` analogue).

Pipeline (reference ``visualize`` :136-437): text embeddings (precomputed or
from a plugged-in encoder) -> sample latents with the chosen solver under
classifier-free guidance -> decode with the VAE (or return latents when no
VAE weights are mounted).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..diffusion import flow_euler_sample_loop
from ..diffusion.dpm_solver import dpm_solver_pp, flow_velocity_to_x0, with_cfg
from ..models.wan import WanConfig, WanModel


def sample_video_latents(
    model: WanModel,
    variables,
    text_emb: jax.Array,  # [B, text_len, text_dim]
    null_emb: Optional[jax.Array] = None,
    latent_shape: Tuple[int, int, int, int] = (21, 60, 100, 16),
    cfg_scale: float = 5.0,
    num_steps: int = 20,
    solver: str = "dpm-solver",  # dpm-solver | flow_euler
    flow_shift: float = 3.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Returns sampled latents [B, F, H, W, C]."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    b = text_emb.shape[0]
    cfg = model.cfg
    if null_emb is None:
        null_emb = jnp.zeros_like(text_emb)

    def velocity(x_t, t, ctx):
        return model.apply(
            variables, x_t.astype(cfg.dtype), t * 1000.0, ctx.astype(cfg.dtype)
        ).astype(jnp.float32)

    guided_v = with_cfg(velocity, text_emb, null_emb, cfg_scale)
    shape = (b, *latent_shape)
    x = jax.random.normal(rng, shape, jnp.float32)

    if solver == "dpm-solver":
        return dpm_solver_pp(
            flow_velocity_to_x0(guided_v), x,
            num_steps=num_steps, order=2, shift=flow_shift,
        )
    if solver == "flow_euler":
        return flow_euler_sample_loop(
            guided_v, shape, rng, num_steps=num_steps, shift=flow_shift
        )
    raise ValueError(f"unknown solver {solver}")

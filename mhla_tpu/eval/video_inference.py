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

from ..diffusion import flow_euler_sample_loop, sa_solver_sample, unipc_sample
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
    clip_fea: Optional[jax.Array] = None,  # [B, 257, image_dim] (i2v)
) -> jax.Array:
    """Returns sampled latents [B, F, H, W, C]."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    b = text_emb.shape[0]
    cfg = model.cfg
    if null_emb is None:
        null_emb = jnp.zeros_like(text_emb)
    if cfg.model_type == "i2v" and clip_fea is None:
        raise ValueError("i2v sampling requires clip_fea (models.clip."
                         "encode_i2v_features on the conditioning frame)")

    def velocity(x_t, t, ctx):
        kwargs = {}
        if clip_fea is not None:
            fea = clip_fea.astype(cfg.dtype)
            if fea.shape[0] != x_t.shape[0]:  # CFG doubles the batch
                fea = jnp.tile(fea, (x_t.shape[0] // fea.shape[0], 1, 1))
            kwargs["clip_fea"] = fea
        return model.apply(
            variables, x_t.astype(cfg.dtype), t * 1000.0, ctx.astype(cfg.dtype),
            **kwargs,
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
    if solver == "unipc":
        return unipc_sample(
            flow_velocity_to_x0(guided_v), x,
            num_steps=num_steps, order=2, shift=flow_shift,
        )
    if solver == "sa-solver":
        return sa_solver_sample(
            flow_velocity_to_x0(guided_v), x,
            num_steps=num_steps, shift=flow_shift, rng=rng,
        )
    raise ValueError(f"unknown solver {solver}")

from .sa_solver import sa_solver_sample
from .unipc import unipc_sample
from .lcm import lcm_sample_loop, lcm_timesteps
from .flow_euler_variants import (
    chunk_flow_euler_sample_loop,
    create_temporal_chunks,
    ltx_flow_euler_sample_loop,
)
from .gaussian_diffusion import (
    GaussianDiffusion,
    create_diffusion,
    flow_euler_sample_loop,
    flow_q_sample,
    flow_training_loss,
    logit_normal_timesteps,
    make_beta_schedule,
    space_timesteps,
)

__all__ = [
    "GaussianDiffusion",
    "chunk_flow_euler_sample_loop",
    "create_diffusion",
    "create_temporal_chunks",
    "flow_euler_sample_loop",
    "flow_q_sample",
    "flow_training_loss",
    "lcm_sample_loop",
    "lcm_timesteps",
    "logit_normal_timesteps",
    "ltx_flow_euler_sample_loop",
    "make_beta_schedule",
    "sa_solver_sample",
    "space_timesteps",
    "unipc_sample",
]

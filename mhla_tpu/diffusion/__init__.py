from .sa_solver import sa_solver_sample
from .unipc import unipc_sample
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
    "create_diffusion",
    "flow_euler_sample_loop",
    "flow_q_sample",
    "flow_training_loss",
    "logit_normal_timesteps",
    "make_beta_schedule",
    "sa_solver_sample",
    "space_timesteps",
    "unipc_sample",
]

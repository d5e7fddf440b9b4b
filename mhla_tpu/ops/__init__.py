"""Functional MHLA operators: jnp oracles + XLA-optimized forms.

These are both the test-oracle layer (every Pallas kernel in
``mhla_tpu.kernels`` is compared against them) and a working fallback on any
JAX backend.
"""

from .block_mix import (
    apply_distance_transform,
    block_centers,
    block_distance_matrix,
    block_mixing_matrix,
    layout_2d_from_patches,
)
from .feature_maps import FEATURE_MAPS, get_feature_map
from .mhla_blockwise import mhla_blockwise
from .losses import fused_kl_div_loss, fused_linear_cross_entropy, grpo_loss, l2_warp
from .mhla_chunk import (
    DEFAULT_CHUNK_SIZE,
    build_segment_mixing,
    clamp_causal_mixing_matrix,
    init_causal_mixing_matrix,
    mhla_chunk,
    mhla_chunk_ref,
    prepare_mixing_matrix,
    segment_positions,
)
from .mhla_recurrent import (
    MHLAState,
    init_mhla_state,
    mhla_recurrent,
    state_from_chunk,
)
from .rotary import (
    apply_rotary,
    apply_rotary_interleaved,
    rope_angles_3d,
    rope_params_3d,
    rotary_cos_sin,
)
from .token_shift import token_shift

__all__ = [
    "DEFAULT_CHUNK_SIZE",
    "FEATURE_MAPS",
    "MHLAState",
    "apply_distance_transform",
    "apply_rotary",
    "apply_rotary_interleaved",
    "block_centers",
    "block_distance_matrix",
    "block_mixing_matrix",
    "build_segment_mixing",
    "clamp_causal_mixing_matrix",
    "fused_kl_div_loss",
    "fused_linear_cross_entropy",
    "get_feature_map",
    "grpo_loss",
    "l2_warp",
    "init_causal_mixing_matrix",
    "init_mhla_state",
    "layout_2d_from_patches",
    "mhla_blockwise",
    "mhla_chunk",
    "mhla_chunk_ref",
    "mhla_recurrent",
    "prepare_mixing_matrix",
    "rope_angles_3d",
    "rope_params_3d",
    "rotary_cos_sin",
    "segment_positions",
    "state_from_chunk",
    "token_shift",
]

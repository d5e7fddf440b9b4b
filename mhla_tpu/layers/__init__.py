from .attention import SelfAttention, sdpa
from .bitlinear import BitLinear, bit_linear
from .long_conv import ImplicitLongConvolution, LongConvolution
from .feature_maps import (
    LEARNABLE_FEATURE_MAPS,
    HadamardFeatureMap,
    HedgehogFeatureMap,
    LearnableOuterProductFeatureMap,
    LearnablePolySketchNonNegativeFeatureMap,
    RebasedFeatureMap,
    T2RFeatureMap,
    TaylorFeatureMap,
    feature_map_output_dim,
)
from .linear_attn import LinearAttention2D, WanLinearAttention, linear_attention
from .mhla_causal import MHLACausal, MHLACausalState
from .mhla_vision import (
    MHLA2D,
    MHLA3D,
    BlockMixing,
    rearrange_from_blocks_3d,
    rearrange_to_blocks_3d,
)
from .mlp import MLP, GatedMLP, default_intermediate_size, swiglu
from .norms import GatedRMSNorm, LayerNorm, RMSNorm, rms_norm
from .short_conv import ShortConvolution

__all__ = [
    "LEARNABLE_FEATURE_MAPS",
    "HadamardFeatureMap",
    "HedgehogFeatureMap",
    "LearnableOuterProductFeatureMap",
    "LearnablePolySketchNonNegativeFeatureMap",
    "MHLA2D",
    "MHLA3D",
    "MLP",
    "BlockMixing",
    "RebasedFeatureMap",
    "T2RFeatureMap",
    "TaylorFeatureMap",
    "feature_map_output_dim",
    "BitLinear",
    "bit_linear",
    "GatedMLP",
    "GatedRMSNorm",
    "ImplicitLongConvolution",
    "LayerNorm",
    "LongConvolution",
    "LinearAttention2D",
    "MHLACausal",
    "MHLACausalState",
    "RMSNorm",
    "SelfAttention",
    "ShortConvolution",
    "WanLinearAttention",
    "default_intermediate_size",
    "linear_attention",
    "rearrange_from_blocks_3d",
    "rearrange_to_blocks_3d",
    "rms_norm",
    "sdpa",
    "swiglu",
]

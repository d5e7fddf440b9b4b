from .clip import (
    CLIPVisionTransformer,
    XLMRobertaCLIP,
    XLMRobertaEncoder,
    convert_clip_checkpoint,
    encode_i2v_features,
)
from .generation import generate
from .gla_lm import (
    MHLABlock,
    MHLAForCausalLM,
    MHLALMConfig,
    MHLAModel,
    cross_entropy_loss,
    init_lm_params,
)

__all__ = [
    "CLIPVisionTransformer",
    "XLMRobertaCLIP",
    "XLMRobertaEncoder",
    "convert_clip_checkpoint",
    "encode_i2v_features",
    "MHLABlock",
    "MHLAForCausalLM",
    "MHLALMConfig",
    "MHLAModel",
    "cross_entropy_loss",
    "generate",
    "init_lm_params",
]

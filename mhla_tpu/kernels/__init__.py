from .flash_attention import flash_attention
from .fmap_rope_pallas import fused_fmap_rope_flat
from .mhla_chunk_pallas import mhla_chunk_fused, mhla_chunk_fused_flat

__all__ = [
    "flash_attention",
    "fused_fmap_rope_flat",
    "mhla_chunk_fused",
    "mhla_chunk_fused_flat",
]

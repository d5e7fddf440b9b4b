from .flash_attention import flash_attention
from .mhla_chunk_pallas import mhla_chunk_fused, mhla_chunk_fused_flat

__all__ = ["flash_attention", "mhla_chunk_fused", "mhla_chunk_fused_flat"]

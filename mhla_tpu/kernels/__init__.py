from .flash_attention import flash_attention
from .fmap_rope_pallas import fused_fmap_rope_flat
from .mhla_block_pallas import (
    blockify_island,
    mhla_blockwise_fused,
    unblockify_island,
)
from .mhla_chunk_pallas import mhla_chunk_fused, mhla_chunk_fused_flat

__all__ = [
    "blockify_island",
    "flash_attention",
    "fused_fmap_rope_flat",
    "mhla_blockwise_fused",
    "mhla_chunk_fused",
    "mhla_chunk_fused_flat",
    "unblockify_island",
]

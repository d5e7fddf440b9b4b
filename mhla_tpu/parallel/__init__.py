from .mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    TENSOR_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
)
from .sharding import (
    fsdp_param_specs,
    fsdp_shardings,
    fsdp_spec,
    shard_params,
    tp_fsdp_param_specs,
)
from .tensor_parallel import mhla_attention_tp_flat, mhla_chunk_tp

__all__ = [
    "DATA_AXIS",
    "FSDP_AXIS",
    "TENSOR_AXIS",
    "batch_sharding",
    "fsdp_param_specs",
    "fsdp_shardings",
    "fsdp_spec",
    "make_mesh",
    "mhla_attention_tp_flat",
    "mhla_chunk_tp",
    "replicated",
    "shard_params",
    "tp_fsdp_param_specs",
]
from .multihost import init_multihost, is_primary  # noqa: E402,F401

__all__ += ["init_multihost", "is_primary"]

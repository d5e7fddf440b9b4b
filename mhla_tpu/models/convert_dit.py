"""Standard-DiT -> MHLA-DiT finetune checkpoint conversion.

The reference finetunes ``DiT_MHLA`` from stock (softmax-attention) DiT
weights by remapping ``attn.qkv -> attn.to_qkv`` and ``attn.proj ->
attn.to_out.0``, dropping the ``piece_attn`` mixing-conv weights, and
loading with ``strict=False`` so MHLA-only parameters stay at their fresh
init (``/root/reference/mhla_dit/train.py:206-231``). Same semantics here,
made explicit: every checkpoint tensor either maps to a flax parameter or
belongs to a module this model replaces; MHLA-specific parameters (mixing
matrix, LePE conv, q/k norms, input norm) come from ``init_params``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .dit import DiTConfig

# MHLA-only parameters inside each attention module that a standard DiT
# checkpoint cannot supply — kept from the fresh initialization (the
# reference trains these from scratch during finetune)
FRESH_ATTN = ("norm", "q_norm", "k_norm", "lepe", "piece_attn")


def _lin(state: Dict[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(np.asarray(state[key + ".weight"]).T)}
    if key + ".bias" in state:
        out["bias"] = np.asarray(state[key + ".bias"])
    return out


def convert_dit_checkpoint(
    state: Dict[str, np.ndarray],
    cfg: DiTConfig,
    init_params: Optional[Dict] = None,
) -> Dict:
    """Convert a torch DiT state dict (facebook DiT layout) into this
    model's param tree for MHLA finetuning. ``init_params`` supplies the
    MHLA-specific parameters absent from the checkpoint."""
    fresh = (init_params or {}).get("params", {})

    params: Dict[str, Any] = {
        # PatchEmbed Conv2d [D, C, p, p] -> flax [p, p, C, D]
        "x_embedder": {
            "kernel": np.asarray(state["x_embedder.proj.weight"]).transpose(
                2, 3, 1, 0
            ),
            "bias": np.asarray(state["x_embedder.proj.bias"]),
        },
        "t_embedder": {
            "fc1": _lin(state, "t_embedder.mlp.0"),
            "fc2": _lin(state, "t_embedder.mlp.2"),
        },
        "y_embedder": {
            "table": {
                "embedding": np.asarray(
                    state["y_embedder.embedding_table.weight"]
                )
            }
        },
        "final_adaLN": _lin(state, "final_layer.adaLN_modulation.1"),
        "final_linear": _lin(state, "final_layer.linear"),
    }

    for i in range(cfg.depth):
        tp = f"blocks.{i}."
        # the reference's key remap: attn.qkv -> to_qkv, attn.proj -> to_out
        qkv_key = (
            tp + "attn.to_qkv" if tp + "attn.to_qkv.weight" in state
            else tp + "attn.qkv"
        )
        out_key = (
            tp + "attn.to_out.0" if tp + "attn.to_out.0.weight" in state
            else tp + "attn.proj"
        )
        attn: Dict[str, Any] = {
            "to_qkv": _lin(state, qkv_key),
            "to_out": _lin(state, out_key),
        }
        fresh_attn = fresh.get(f"blocks_{i}", {}).get("attn", {})
        if not fresh_attn:
            raise KeyError(
                f"blocks_{i}.attn fresh params missing: pass init_params "
                "(MHLA mixing/LePE/norms are trained from scratch)"
            )
        for name in FRESH_ATTN:
            if name in fresh_attn:
                attn[name] = fresh_attn[name]
        params[f"blocks_{i}"] = {
            "adaLN_modulation": _lin(state, tp + "adaLN_modulation.1"),
            "attn": attn,
            "mlp": {
                "fc1": _lin(state, tp + "mlp.fc1"),
                "fc2": _lin(state, tp + "mlp.fc2"),
            },
        }
    return {"params": params}

"""LoRA finetuning (functional, framework-wide).

Reference: the video trainer wraps the model with PEFT LoRA
(``train_wan.py:1333-1377``). Here LoRA is a pure parameter transform: for
every 2D Dense kernel whose path matches the target filter, low-rank factors
(A, B) are created; ``merge_lora`` produces effective params
``W + (alpha/rank) * A @ B`` for the unchanged model apply, and only the
LoRA tree is optimized. This works for any flax model in the framework.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("q", "k", "v", "o", "q_proj", "k_proj", "v_proj", "o_proj",
                   "to_qkv", "to_out")


def _path_names(path) -> Tuple[str, ...]:
    return tuple(getattr(k, "key", getattr(k, "name", "")) for k in path)


def _is_target(names: Tuple[str, ...], leaf, targets: Sequence[str]) -> bool:
    return (
        len(names) >= 2
        and names[-1] == "kernel"
        and getattr(leaf, "ndim", 0) == 2
        and names[-2] in targets
    )


def init_lora(
    params: Any,
    rng: jax.Array,
    rank: int = 16,
    targets: Sequence[str] = DEFAULT_TARGETS,
) -> Any:
    """LoRA tree mirroring ``params``: {'a': [in, r], 'b': [r, out]} at each
    targeted kernel, None elsewhere (same treedef as params)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    rngs = jax.random.split(rng, len(flat))
    for (path, leaf), r in zip(flat, rngs):
        names = _path_names(path)
        if _is_target(names, leaf, targets):
            n_in, n_out = leaf.shape
            a = jax.random.normal(r, (n_in, rank), jnp.float32) * (1.0 / rank)
            b = jnp.zeros((rank, n_out), jnp.float32)  # zero init: no-op start
            leaves.append({"a": a, "b": b})
        else:
            leaves.append(None)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _lora_leaf(x) -> bool:
    return x is None or (isinstance(x, dict) and set(x.keys()) == {"a", "b"})


def merge_lora(params: Any, lora: Any, alpha: float = 16.0) -> Any:
    """Effective params W + (alpha/rank) * A @ B (jit-safe, differentiable
    w.r.t. the LoRA tree)."""
    p_flat, treedef = jax.tree_util.tree_flatten(params)
    l_flat = jax.tree_util.tree_flatten(lora, is_leaf=_lora_leaf)[0]
    assert len(p_flat) == len(l_flat), "lora tree does not mirror params"

    merged = []
    for p, l in zip(p_flat, l_flat):
        if l is None:
            merged.append(p)
        else:
            scale = alpha / l["a"].shape[1]
            delta = (l["a"] @ l["b"]) * scale
            merged.append((p.astype(jnp.float32) + delta).astype(p.dtype))
    return jax.tree_util.tree_unflatten(treedef, merged)


def lora_param_count(lora: Any) -> int:
    return sum(
        x.size
        for x in jax.tree_util.tree_leaves(lora)
        if hasattr(x, "size")
    )

"""Numeric sanitizers: NaN/overflow monitors and circuit breakers.

TPU equivalents of the reference's runtime monitors: ``NaNMonitorCallback``
(``legacy/training/run.py:35-61``), ``DebugUnderflowOverflow``
(``diffusion/utils/misc.py:167``), and the 20-NaN-loss abort
(``train_wan.py:791-792``). In JAX the checks run on metric values pulled
to host (the graphs themselves stay pure).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp


def finite_check(tree: Any) -> jax.Array:
    """Scalar bool: every leaf of the tree is finite (jit-safe)."""
    leaves = [
        jnp.isfinite(x).all()
        for x in jax.tree.leaves(tree)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
    ]
    return jnp.all(jnp.stack(leaves)) if leaves else jnp.asarray(True)


def debug_overflow_stats(tree: Any) -> Dict[str, jax.Array]:
    """Per-tree abs-max/abs-min for under/overflow debugging."""
    finite_leaves = [
        jnp.abs(x.astype(jnp.float32))
        for x in jax.tree.leaves(tree)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
    ]
    if not finite_leaves:
        return {}
    return {
        "abs_max": jnp.max(jnp.stack([jnp.max(x) for x in finite_leaves])),
        "abs_min_nonzero": jnp.min(
            jnp.stack([jnp.min(jnp.where(x == 0, jnp.inf, x)) for x in finite_leaves])
        ),
    }


class NaNLossBreaker:
    """Abort training after ``patience`` consecutive non-finite losses
    (reference aborts after 20, ``train_wan.py:791-792``)."""

    def __init__(self, patience: int = 20):
        self.patience = patience
        self.count = 0

    def update(self, loss: float) -> bool:
        """Returns True when training should abort."""
        if math.isfinite(loss):
            self.count = 0
        else:
            self.count += 1
        return self.count >= self.patience

"""Kernel-test harness: relative-error comparison utilities.

TPU-native analogue of the reference's residual test harness
(``mhla_nlp/fla/utils.py:72-93`` — get_abs_err / get_err_ratio /
assert_close), which is the only testing infrastructure the reference
ships. We keep the same semantics (relative RMS error ratio against a
tolerance) so kernel-vs-oracle comparisons carry over.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

IS_CI = os.getenv("CI", "") != ""


def get_abs_err(x, y) -> float:
    x = np.asarray(x, dtype=np.float64).ravel()
    y = np.asarray(y, dtype=np.float64).ravel()
    return float(np.max(np.abs(x - y)))


def get_err_ratio(x, y) -> float:
    """Relative RMS error: ||x - y||_rms / ||x||_rms."""
    x = np.asarray(x, dtype=np.float64).ravel()
    y = np.asarray(y, dtype=np.float64).ravel()
    err = np.sqrt(np.mean(np.square(x - y)))
    base = np.sqrt(np.mean(np.square(x)))
    return float(err / (base + 1e-20))


def assert_close(prefix: str, ref, tri, ratio: float, warning: bool = False):
    """Assert relative RMS error between ``ref`` and ``tri`` is < ``ratio``."""
    abs_err = get_abs_err(ref, tri)
    rel_err = get_err_ratio(ref, tri)
    msg = f"{prefix} diff: {abs_err:.6f} ratio: {rel_err:.6f}"
    if warning and rel_err >= ratio:
        print(f"WARN {msg}")
        return
    assert rel_err < ratio, msg


def tree_assert_close(prefix, ref_tree, tri_tree, ratio: float):
    leaves_ref = jax.tree_util.tree_leaves(ref_tree)
    leaves_tri = jax.tree_util.tree_leaves(tri_tree)
    assert len(leaves_ref) == len(leaves_tri)
    for i, (a, b) in enumerate(zip(leaves_ref, leaves_tri)):
        assert_close(f"{prefix}[{i}]", a, b, ratio)


def randn(key, shape, dtype=jnp.float32, std: float = 1.0):
    return (jax.random.normal(key, shape) * std).astype(dtype)

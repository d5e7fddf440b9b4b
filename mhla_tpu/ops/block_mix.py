"""Block-mixing matrices from spatial block-center distances (2D and 3D).

The non-causal MHLA variants mix per-block KV states with an [N, N] matrix
derived from Euclidean distances between block centers on a 2D (images) or
3D (video: frames x height x width) grid, passed through one of several
transforms and column-normalized.

Semantics match the reference ``BlockDistanceConv``
(``mhla_dit/mhla/mhla.py:10-138``, duplicated in
``mhla_image_classification/models/modules/attention/mhla.py:10-138``) and
``BlockDistanceConv3D`` (``mhla_videogen/diffusion/model/wan/mhla_utils.py:9-125``).
The reference realizes the mixing as a 1x1 Conv2d over the block channel;
on TPU it is a plain [N, N] matmul over the block axis (MXU-friendly, and
XLA fuses it into the surrounding einsums).

Normalization detail: every transform except ``gaussian`` divides by the
*column* sums (``mat / mat.sum(dim=0, keepdim=True)`` in the reference), so
each column sums to 1; ``gaussian`` is returned unnormalized.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np

VALID_TRANSFORMS = ("linear", "cos", "exp", "gaussian", "local")


def block_centers(blocks_layout: Sequence[int]) -> np.ndarray:
    """Centers of a dense grid of blocks, e.g. (4, 4) or (3, 5, 10)."""
    grids = np.meshgrid(
        *[np.arange(n, dtype=np.float64) + 0.5 for n in blocks_layout],
        indexing="ij",
    )
    return np.stack([g.ravel() for g in grids], axis=-1)  # [prod(layout), ndim]


def block_distance_matrix(blocks_layout: Sequence[int]) -> np.ndarray:
    c = block_centers(blocks_layout)
    diff = c[:, None, :] - c[None, :, :]
    return np.sqrt(np.sum(diff * diff, axis=-1))


def apply_distance_transform(
    dist: np.ndarray,
    transform: str = "linear",
    local_thres: float = 1.5,
    exp_sigma: float = 3.0,
) -> np.ndarray:
    """Distance matrix -> mixing weights. See module docstring for norms."""
    # single-block (or degenerate) grids have an all-zero distance matrix;
    # normalize by 1 so the transforms yield uniform weights instead of NaN
    max_dist = dist.max() if dist.max() > 0 else 1.0
    if transform == "linear":
        mat = 1.0 - dist / max_dist
        return mat / mat.sum(axis=0, keepdims=True)
    if transform == "cos":
        mat = np.cos(dist / max_dist * math.pi / 4)
        return mat / mat.sum(axis=0, keepdims=True)
    if transform == "exp":
        mat = np.exp(-dist / exp_sigma)
        return mat / mat.sum(axis=0, keepdims=True)
    if transform == "gaussian":
        sigma = max_dist / 3
        return np.exp(-(dist**2) / (2 * sigma**2))
    if transform == "local":
        mat = (dist <= local_thres).astype(np.float64)
        return mat / mat.sum(axis=0, keepdims=True)
    raise ValueError(f"Unknown transform: {transform!r} (valid: {VALID_TRANSFORMS})")


def block_mixing_matrix(
    blocks_layout: Sequence[int],
    transform: str = "linear",
    local_thres: float = 1.5,
    exp_sigma: float = 3.0,
    dtype=np.float32,
) -> np.ndarray:
    """[N, N] mixing matrix for a 2D or 3D block grid (N = prod(layout))."""
    dist = block_distance_matrix(blocks_layout)
    return apply_distance_transform(dist, transform, local_thres, exp_sigma).astype(dtype)


def layout_2d_from_patches(
    num_patches_per_side: int, patch_group_size: int
) -> Tuple[int, int]:
    """2D blocks layout from a square patch grid and square block size.

    E.g. 16x16 patches in blocks of 16 patches (4x4) -> (4, 4) blocks.
    Mirrors the reference constructor arithmetic (``mhla.py:33-37``).
    """
    patches_per_block_side = int(math.isqrt(patch_group_size))
    blocks_per_side = num_patches_per_side // patches_per_block_side
    return (blocks_per_side, blocks_per_side)

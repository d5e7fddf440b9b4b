"""FID evaluation plumbing: the 50k-sample .npz builder.

Reference: ``mhla_dit/sample_ddp.py`` samples 50k class-conditional images
across ranks and packs them into the ADM-evaluator ``.npz`` format
(``sample_ddp.py:28-41``); the FID score itself comes from the external ADM
evaluator. This module reproduces the sampling+packing side on TPU.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def latents_to_uint8(images: np.ndarray) -> np.ndarray:
    """[-1, 1] float NHWC -> uint8 (ADM npz convention)."""
    x = np.clip((images + 1.0) * 127.5, 0, 255)
    return np.rint(x).astype(np.uint8)


def build_sample_npz(
    sample_fn: Callable[[jax.Array, jax.Array], jax.Array],
    num_samples: int,
    batch_size: int,
    num_classes: int,
    out_path: str,
    rng: Optional[jax.Array] = None,
) -> str:
    """Generate ``num_samples`` images and write the ADM-format npz.

    ``sample_fn(labels, rng) -> [B, H, W, 3] images in [-1, 1]`` (typically
    DiT CFG sampling + VAE decode).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    chunks = []
    done = 0
    while done < num_samples:
        rng, lr, sr = jax.random.split(rng, 3)
        n = min(batch_size, num_samples - done)
        labels = jax.random.randint(lr, (batch_size,), 0, num_classes)
        imgs = np.asarray(sample_fn(labels, sr))[:n]
        chunks.append(latents_to_uint8(imgs))
        done += n
    arr = np.concatenate(chunks, axis=0)[:num_samples]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, arr_0=arr)
    return out_path

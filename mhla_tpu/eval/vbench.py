"""VBench evaluation plumbing: sample videos and export mp4s.

Reference flow (``mhla_videogen/inference.py``): prompts from a txt file ->
sample latents with DPM-Solver under CFG -> VAE decode -> mp4 via imageio;
the VBench scores themselves come from the external VBench toolkit run over
the exported directory. This module reproduces the TPU-side pipeline.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def to_uint8_video(frames: np.ndarray) -> np.ndarray:
    """[T, H, W, 3] in [-1, 1] -> uint8."""
    return np.rint(np.clip((frames + 1.0) * 127.5, 0, 255)).astype(np.uint8)


def write_mp4(path: str, frames: np.ndarray, fps: int = 16) -> str:
    """frames: [T, H, W, 3] float in [-1, 1] or uint8."""
    import imageio

    if frames.dtype != np.uint8:
        frames = to_uint8_video(frames)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    imageio.mimwrite(path, list(frames), fps=fps, codec="libx264")
    return path


def read_prompts(txt_file: str) -> List[str]:
    """One prompt per line (reference ``samples_video.txt`` convention)."""
    return [
        line.strip()
        for line in Path(txt_file).read_text().splitlines()
        if line.strip()
    ]


def export_vbench_videos(
    prompts: Sequence[str],
    sample_latents: Callable[[str, jax.Array], jax.Array],
    decode: Callable[[jax.Array], jax.Array],
    out_dir: str,
    fps: int = 16,
    seeds: Sequence[int] = (0,),
) -> List[str]:
    """Sample + decode + export one mp4 per (prompt, seed), named for the
    VBench toolkit (``<prompt>-<seed>.mp4``)."""
    paths = []
    for prompt in prompts:
        for seed in seeds:
            lat = sample_latents(prompt, jax.random.PRNGKey(seed))
            video = np.asarray(decode(lat))[0]  # [T, H, W, 3]
            safe = prompt[:180].replace("/", "_")
            paths.append(
                write_mp4(f"{out_dir}/{safe}-{seed}.mp4", video, fps=fps)
            )
    return paths

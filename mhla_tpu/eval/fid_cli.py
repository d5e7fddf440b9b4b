"""FID sampler CLI: DiT checkpoint -> ADM-evaluator .npz.

The reference's ``mhla_dit/sample_ddp.py`` (DDP 50k class-conditional
sampler + npz packer) as a single-program CLI: class-conditional CFG
sampling with the respaced DDPM loop, decoded through the 2D SD-VAE when
weights are available (otherwise the latents are packed directly, marked in
the manifest).

Usage:
    python -m mhla_tpu.eval.fid_cli --model_name=DiT-S/2 --ckpt=... \
        --num_samples=50000 --out=samples.npz
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import create_diffusion
from ..models.dit import build_dit
from ..utils.config import dump_config, parse_cli
from .fid import build_sample_npz


@dataclasses.dataclass
class FIDSampleConfig:
    model_name: str = "DiT-S/2"
    input_size: int = 32
    block_size: int = 16
    num_classes: int = 1000
    ckpt: Optional[str] = None  # orbax train checkpoint; None -> random init
    use_ema: bool = True
    vae_ckpt: Optional[str] = None  # SD-VAE decoder weights (diffusers pt)
    num_samples: int = 50000
    batch_size: int = 32
    cfg_scale: float = 1.5
    num_sampling_steps: int = 250
    seed: int = 0
    out: str = "work_dirs/fid/samples.npz"
    # size overrides for smoke runs
    depth: Optional[int] = None
    hidden_size: Optional[int] = None
    num_heads: Optional[int] = None


def main(argv=None) -> dict:
    cfg = parse_cli(FIDSampleConfig, argv if argv is not None else sys.argv[1:])
    out_dir = os.path.dirname(cfg.out) or "."
    os.makedirs(out_dir, exist_ok=True)
    dump_config(cfg, os.path.join(out_dir, "fid_config.yaml"))

    overrides = {
        k: getattr(cfg, k)
        for k in ("depth", "hidden_size", "num_heads")
        if getattr(cfg, k) is not None
    }
    model, _ = build_dit(
        cfg.model_name, input_size=cfg.input_size, block_size=cfg.block_size,
        num_classes=cfg.num_classes, **overrides,
    )

    x0 = jnp.zeros((1, cfg.input_size, cfg.input_size, model.cfg.in_channels))
    template = model.init(
        jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    if cfg.ckpt:
        from ..utils.checkpoint import load_params_from_checkpoint

        variables = load_params_from_checkpoint(cfg.ckpt, template)
    else:
        variables = template

    vae = vae_params = None
    if cfg.vae_ckpt:
        import torch

        from ..models.vae2d import VAE2D, convert_sd_vae_checkpoint

        vae = VAE2D()
        state = torch.load(cfg.vae_ckpt, map_location="cpu")
        vae_params = convert_sd_vae_checkpoint(
            {k: v.numpy() for k, v in state.items()}
        )

    diffusion, t_map = create_diffusion(
        timestep_respacing=str(cfg.num_sampling_steps), learn_sigma=True
    )
    null_label = cfg.num_classes  # the CFG null class embedding slot

    def sample_fn(labels, rng):
        b = labels.shape[0]
        y = jnp.concatenate([labels, jnp.full_like(labels, null_label)])
        model_fn = lambda x, t: model.forward_with_cfg(  # noqa: E731
            variables, x, t, y, cfg.cfg_scale
        )
        shape = (2 * b, cfg.input_size, cfg.input_size, model.cfg.in_channels)
        lat = diffusion.p_sample_loop(model_fn, shape, rng, timestep_map=t_map)
        lat = lat[:b]
        if vae is not None:
            img = vae.apply(vae_params, lat / 0.18215, method=VAE2D.decode)
            return img
        return jnp.clip(lat, -1, 1)  # latent-space npz (no VAE mounted)

    path = build_sample_npz(
        jax.jit(sample_fn), cfg.num_samples, cfg.batch_size, cfg.num_classes,
        cfg.out, rng=jax.random.PRNGKey(cfg.seed),
    )
    manifest = {
        "npz": path,
        "num_samples": cfg.num_samples,
        "decoded": vae is not None,
        "cfg_scale": cfg.cfg_scale,
        "steps": cfg.num_sampling_steps,
    }
    with open(os.path.join(out_dir, "fid_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


if __name__ == "__main__":
    main()

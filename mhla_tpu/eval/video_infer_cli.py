"""Video inference CLI: prompts file -> sampled videos (mp4 or latents).

The reference's ``inference.py:445`` pyrallis CLI (``--model_path=...
--txt_file=samples_video.txt``) re-designed around this framework's config
system: YAML + ``--a.b=v`` dotted overrides.

Text conditioning is pluggable (the 4.8 GB umT5 usually runs offline):
- ``emb_file``: an .npz of precomputed text embeddings keyed ``emb_0``,
  ``emb_1``, ... (+ optional ``null``), one per prompt line, OR
- ``t5_dir``: a converted umT5 checkpoint directory to encode prompts live,
- neither: zero embeddings (smoke/perf runs).

Model weights load from an orbax train checkpoint (``ckpt``) or a reference
safetensors file (``wan_safetensors``, converted on the fly); absent both,
the model runs randomly initialized (smoke).

Usage:
    python -m mhla_tpu.eval.video_infer_cli cfg.yaml --sampling.solver=unipc
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wan import WanModel, build_wan_config
from ..utils.config import dump_config, parse_cli
from .vbench import read_prompts, to_uint8_video, write_mp4
from .video_inference import sample_video_latents


@dataclasses.dataclass
class SamplingConfig:
    solver: str = "dpm-solver"  # dpm-solver | flow_euler | unipc | sa-solver
    num_steps: int = 20
    cfg_scale: float = 5.0
    flow_shift: float = 3.0
    latent_shape: Tuple[int, int, int, int] = (21, 60, 100, 16)
    seed: int = 0


@dataclasses.dataclass
class VideoInferConfig:
    model_name: str = "Wan_T2V_1300M"
    linear_attn_idx: Optional[Tuple[int, ...]] = None
    txt_file: str = "samples_video.txt"
    out_dir: str = "work_dirs/video_infer"
    ckpt: Optional[str] = None  # orbax train checkpoint (params template)
    wan_safetensors: Optional[str] = None  # reference checkpoint
    emb_file: Optional[str] = None  # precomputed text embeddings npz
    t5_dir: Optional[str] = None  # converted umT5 weights (live encode)
    vae_ckpt: Optional[str] = None  # WanVAE weights; None -> save latents
    sampling: SamplingConfig = dataclasses.field(default_factory=SamplingConfig)
    batch_size: int = 1
    bf16: bool = True
    fps: int = 16
    # tiny-override knobs for smoke tests
    num_layers: Optional[int] = None
    dim: Optional[int] = None
    num_heads: Optional[int] = None
    ffn_dim: Optional[int] = None
    text_dim: Optional[int] = None
    text_len: Optional[int] = None


def _build_model(cfg: VideoInferConfig) -> WanModel:
    overrides = {}
    for k in ("num_layers", "dim", "num_heads", "ffn_dim", "text_dim",
              "text_len"):
        v = getattr(cfg, k)
        if v is not None:
            overrides[k] = v
    if cfg.linear_attn_idx is not None:
        overrides["linear_attn_idx"] = tuple(cfg.linear_attn_idx)
    if cfg.bf16:
        overrides["dtype"] = jnp.bfloat16
    return WanModel(build_wan_config(cfg.model_name, **overrides))


def _load_params(cfg: VideoInferConfig, model: WanModel, latent_shape):
    f, h, w, c = latent_shape
    init = lambda: model.init(  # noqa: E731
        jax.random.PRNGKey(0),
        jnp.zeros((1, f, h, w, c), model.cfg.dtype),
        jnp.zeros((1,)),
        jnp.zeros((1, model.cfg.text_len, model.cfg.text_dim), model.cfg.dtype),
    )
    if cfg.wan_safetensors:
        from ..models.convert_wan import convert_wan_checkpoint, load_wan_safetensors

        state = load_wan_safetensors(cfg.wan_safetensors)
        return convert_wan_checkpoint(state, model.cfg)
    if cfg.ckpt:
        from ..utils.checkpoint import load_params_from_checkpoint

        template = init()
        return load_params_from_checkpoint(cfg.ckpt, template)
    return init()


def _text_embeddings(cfg: VideoInferConfig, prompts, model_cfg):
    shape = (len(prompts), model_cfg.text_len, model_cfg.text_dim)
    null = None
    if cfg.emb_file:
        data = np.load(cfg.emb_file)
        embs = np.stack([data[f"emb_{i}"] for i in range(len(prompts))])
        null = data["null"] if "null" in data else None
        assert embs.shape[1:] == shape[1:], (embs.shape, shape)
        return jnp.asarray(embs), (
            jnp.asarray(null)[None].repeat(len(prompts), 0)
            if null is not None
            else None
        )
    if cfg.t5_dir:
        # live in-process text encoding (reference ``inference.py:206``):
        # encode the prompts plus one null/empty prompt for CFG
        from ..models.t5 import T5TextEncoder

        encoder = T5TextEncoder(cfg.t5_dir, text_len=model_cfg.text_len)
        # one batch = one encoder compile: the null/CFG prompt rides along
        # instead of triggering a second batch-1 compile of the encoder
        all_embs = encoder(list(prompts) + [""])
        assert all_embs.shape[-1] == model_cfg.text_dim, (
            f"T5 dim {all_embs.shape[-1]} != model text_dim {model_cfg.text_dim}"
        )
        embs, null = all_embs[:-1], all_embs[-1]
        return embs, jnp.asarray(null)[None].repeat(len(prompts), 0)
    return jnp.zeros(shape, jnp.float32), None


def main(argv=None) -> dict:
    cfg = parse_cli(VideoInferConfig, argv if argv is not None else sys.argv[1:])
    os.makedirs(cfg.out_dir, exist_ok=True)
    dump_config(cfg, os.path.join(cfg.out_dir, "config.yaml"))

    prompts = read_prompts(cfg.txt_file)
    model = _build_model(cfg)
    variables = _load_params(cfg, model, cfg.sampling.latent_shape)
    vae = vae_params = None
    if cfg.vae_ckpt:
        from ..models.vae import VAEConfig, WanVAE
        from ..utils.checkpoint import load_checkpoint

        vae = WanVAE(VAEConfig())
        vae_params = load_checkpoint(cfg.vae_ckpt, None)

    results = []
    text_emb, null_emb = _text_embeddings(cfg, prompts, model.cfg)
    for start in range(0, len(prompts), cfg.batch_size):
        batch = prompts[start : start + cfg.batch_size]
        text_emb_b = text_emb[start : start + len(batch)]
        null_b = null_emb[start : start + len(batch)] if null_emb is not None else None
        rng = jax.random.PRNGKey(cfg.sampling.seed + start)
        latents = sample_video_latents(
            model, variables, text_emb_b, null_b,
            latent_shape=tuple(cfg.sampling.latent_shape),
            cfg_scale=cfg.sampling.cfg_scale,
            num_steps=cfg.sampling.num_steps,
            solver=cfg.sampling.solver,
            flow_shift=cfg.sampling.flow_shift,
            rng=rng,
        )
        for j, prompt in enumerate(batch):
            idx = start + j
            stem = os.path.join(cfg.out_dir, f"sample_{idx:04d}")
            if vae is not None:
                frames = vae.apply(vae_params, latents[j : j + 1],
                                   method=vae.decode)
                path = write_mp4(
                    stem + ".mp4", to_uint8_video(np.asarray(frames[0])),
                    fps=cfg.fps,
                )
            else:
                path = stem + ".npy"
                np.save(path, np.asarray(latents[j]))
            results.append({"prompt": prompt, "path": path})

    manifest = os.path.join(cfg.out_dir, "manifest.json")
    with open(manifest, "w") as fh:
        json.dump(results, fh, indent=2)
    return {"outputs": results, "manifest": manifest}


if __name__ == "__main__":
    main()

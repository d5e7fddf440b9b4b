"""DiT feature extraction: image folder -> SD-VAE latents as .npy pairs.

Reference: ``mhla_dit/extract_features.py`` — for each image it encodes the
ADM-center-cropped image AND its horizontal flip
(``vae.encode(x).latent_dist.sample().mul_(0.18215)``, :203-211) and writes
``<out>/imagenet256_features/N.npy`` ([2, 4, H/8, W/8]) plus
``<out>/imagenet256_labels/N.npy``. Output layout and scaling match, so
latents are interchangeable between the two frameworks.

Usage:
    python -m mhla_tpu.data.extract_features --image_dir=... --out_dir=... \
        [--vae_ckpt=sd-vae.safetensors] [--image_size=256] [--batch_size=8]

Without --vae_ckpt the VAE is randomly initialized (smoke/testing only).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def load_vae_params(vae, ckpt: str | None, rng, image_size: int):
    import jax
    import jax.numpy as jnp

    if ckpt is None:
        x0 = jnp.zeros((1, image_size, image_size, 3))
        return vae.init(rng, x0)
    from ..models.vae2d import convert_sd_vae_checkpoint

    path = Path(ckpt)
    if path.suffix == ".safetensors":
        from ..models.convert_wan import load_wan_safetensors

        sd = load_wan_safetensors(str(path))
    elif path.suffix in (".npz",):
        sd = dict(np.load(path))
    else:  # torch .bin / .pt / .ckpt
        import torch

        sd = {
            k: v.numpy()
            for k, v in torch.load(path, map_location="cpu", weights_only=True).items()
        }
        if "state_dict" in sd:
            sd = sd["state_dict"]
    return convert_sd_vae_checkpoint(sd)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--vae_ckpt", default=None)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--limit", type=int, default=None, help="max images")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..models.vae2d import VAE2D
    from .image_data import _require_pil, center_crop_arr, list_image_folder

    Image = _require_pil()
    vae = VAE2D()
    params = load_vae_params(
        vae, args.vae_ckpt, jax.random.PRNGKey(0), args.image_size
    )

    @jax.jit
    def encode(params, imgs, rng):
        return vae.apply(params, imgs, rng, method=VAE2D.encode)

    feat_dir = Path(args.out_dir) / "imagenet256_features"
    label_dir = Path(args.out_dir) / "imagenet256_labels"
    feat_dir.mkdir(parents=True, exist_ok=True)
    label_dir.mkdir(parents=True, exist_ok=True)

    samples, _classes = list_image_folder(args.image_dir)
    if args.limit:
        samples = samples[: args.limit]
    rng = jax.random.PRNGKey(args.seed)

    n_done = 0
    for start in range(0, len(samples), args.batch_size):
        batch = samples[start : start + args.batch_size]
        imgs, flips, labels = [], [], []
        for path, lab in batch:
            arr = center_crop_arr(Image.open(path), args.image_size)
            arr = arr.astype(np.float32) / 127.5 - 1.0  # [-1, 1]
            imgs.append(arr)
            flips.append(arr[:, ::-1])
            labels.append(lab)
        x = jnp.asarray(np.stack(imgs + flips))
        rng, sub = jax.random.split(rng)
        z = np.asarray(encode(params, x, sub))  # [2B, h, w, 4] NHWC
        z = z.transpose(0, 3, 1, 2)  # reference stores NCHW
        bsz = len(batch)
        for j, lab in enumerate(labels):
            pair = np.stack([z[j], z[bsz + j]])  # [2, 4, h, w]
            np.save(feat_dir / f"{n_done}.npy", pair)
            np.save(label_dir / f"{n_done}.npy", np.asarray([lab]))
            n_done += 1
    print(f"[extract_features] wrote {n_done} latent pairs to {args.out_dir}",
          file=sys.stderr)
    return n_done


if __name__ == "__main__":
    main()

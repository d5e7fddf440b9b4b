"""Wan-1.3B forward-pass latency: hybrid MHLA vs full softmax vs full linear.

The TPU analogue of the reference's headline table (README.md: 139 s
softmax / 84 s hybrid / 62 s full-MHLA per video — per-video latency is
solver_steps x 2 forwards, so forward latency ratios are the comparison).
Runs the real 1.3B architecture at the 480p x 81-frame scenario
(21 x 60 x 100 latents -> 31.5k tokens after the grid crop).

Usage: python benchmarks/wan_bench.py [--modes hybrid,softmax,mhla,linear]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def measure(f, args, n1=2, n2=6):
    """Chained timing with host-read barriers (see bench.py notes)."""
    import jax
    import jax.numpy as jnp

    x = f(*args)
    float(jnp.sum(x[..., 0].astype(jnp.float32)))  # compile + warm

    def run(n):
        z, t, ctx = args
        t0 = time.perf_counter()
        for i in range(n):
            out = f(z, t + i, ctx)
            z = out[..., : z.shape[-1]]  # chain: output feeds input
        float(jnp.sum(z[..., 0].astype(jnp.float32)))
        return time.perf_counter() - t0

    return (run(n2) - run(n1)) / (n2 - n1)


def layer_mode(args):
    """Time one WanBlock forward per attention flavor at the bench scenario
    (post-patchify grid) — attributes the full-model gap to layers."""
    import jax
    import jax.numpy as jnp

    from mhla_tpu.models.wan import WanBlock, build_wan_config

    grid = (args.frames, args.height // 2, args.width // 2)
    t = grid[0] * grid[1] * grid[2]
    x = jax.random.normal(jax.random.PRNGKey(0), (1, t, 1536), jnp.bfloat16)
    e0 = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 1536), jnp.float32) * 0.02
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 512, 1536), jnp.bfloat16) * 0.02

    results = {}
    for mode in ("mhla", "flash", "linear", "sparse"):
        attn = {
            "mhla": dict(linear_attn_idx=(0,), attn_type="mhla_uni"),
            "linear": dict(linear_attn_idx=(0,), attn_type="linear"),
            "flash": dict(linear_attn_idx=()),
            "sparse": dict(
                linear_attn_idx=(), sparse_attn_idx=(0,),
                sparse_dense_from_t=None,
            ),
        }[mode]
        cfg = build_wan_config(
            "Wan_T2V_1300M",
            rope_after=True, normalize_out=False, is_gated=True,
            grid_adjust=True, remat=False, dtype=jnp.bfloat16,
            attn_compute_dtype=jnp.bfloat16 if args.bf16_attn else None,
            **attn,
        )
        block = WanBlock(cfg, 0)
        # grid must stay static: close over it (e0/ctx are small constants)
        params = jax.jit(lambda r, xx: block.init(r, xx, e0, ctx, grid))(
            jax.random.PRNGKey(0), x
        )
        if args.bwd:
            # train-step cost: fwd+bwd w.r.t. params AND activations (the
            # block sits mid-network, so dx flows too)
            def loss(p, xx):
                o = block.apply(p, xx, e0, ctx, grid)
                return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6, o

            vg = jax.jit(jax.grad(loss, argnums=(0, 1), has_aux=True))

            def f(z, _t, _c):
                (gp, gx), o = vg(params, z)
                return o + gx

        else:
            fwd = jax.jit(lambda p, xx: block.apply(p, xx, e0, ctx, grid))

            def f(z, _t, _c):
                return fwd(params, z)

        dt = measure(f, (x, 0, ctx), n1=3, n2=9)
        results[mode] = dt
        print(f"[wan_bench --layer] {mode}: {dt*1e3:.2f} ms/block", flush=True)
        del params
    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="hybrid,softmax,mhla")
    ap.add_argument("--frames", type=int, default=21)
    ap.add_argument("--height", type=int, default=60)
    ap.add_argument("--width", type=int, default=100)
    ap.add_argument("--bf16_attn", action="store_true",
                    help="bf16 MHLA attention matmuls (fp32 accumulation)")
    ap.add_argument("--layer", action="store_true",
                    help="time ONE WanBlock per attention flavor instead of "
                         "the full model (per-layer cost attribution)")
    ap.add_argument("--bwd", action="store_true",
                    help="with --layer: time fwd+bwd (train-step cost) "
                         "instead of forward only")
    args = ap.parse_args()

    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS at init, so an env-var
    # "cpu" smoke run would silently land on the REAL chip (and collide
    # with any concurrent bench) — re-assert the request via jax.config
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from mhla_tpu.models.wan import WanModel, build_wan_config

    if args.layer:
        return layer_mode(args)

    hybrid_idx = tuple(i for i in range(30) if i % 3 != 0)  # 20/30 MHLA
    mode_cfg = {
        "hybrid": dict(linear_attn_idx=hybrid_idx, attn_type="mhla_uni"),
        "mhla": dict(linear_attn_idx=tuple(range(30)), attn_type="mhla_uni"),
        "linear": dict(linear_attn_idx=tuple(range(30)), attn_type="linear"),
        "softmax": dict(linear_attn_idx=(), attn_type="flash"),
        # radial n-log-n block-sparse splash attention on every layer
        # (inference guard disabled so the sparse path is what's measured)
        "sparse": dict(
            linear_attn_idx=(),
            sparse_attn_idx=tuple(range(30)),
            sparse_dense_from_t=None,
        ),
        # sparse softmax on the softmax slots of the hybrid schedule
        "hybrid_sparse": dict(
            linear_attn_idx=hybrid_idx,
            attn_type="mhla_uni",
            sparse_attn_idx=tuple(i for i in range(30) if i % 3 == 0),
            sparse_dense_from_t=None,
        ),
    }

    z = jax.random.normal(
        jax.random.PRNGKey(0),
        (1, args.frames, args.height, args.width, 16),
        jnp.bfloat16,
    )
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 4096), jnp.bfloat16) * 0.02

    results = {}
    for mode in args.modes.split(","):
        cfg = build_wan_config(
            "Wan_T2V_1300M",
            rope_after=True, normalize_out=False, is_gated=True,
            grid_adjust=True, remat=False, dtype=jnp.bfloat16,
            attn_compute_dtype=jnp.bfloat16 if args.bf16_attn else None,
            **mode_cfg[mode],
        )
        model = WanModel(cfg)
        t0 = time.perf_counter()
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), z, jnp.zeros((1,)), ctx
        )
        n_params = sum(p.size for p in jax.tree.leaves(params))
        fwd = jax.jit(
            lambda p, zz, tt, cc: model.apply(p, zz, tt, cc)
        )
        f = lambda zz, tt, cc: fwd(params, zz, tt, cc)  # noqa: E731
        dt = measure(f, (z, jnp.full((1,), 500.0), ctx))
        results[mode] = dt
        print(
            f"[wan_bench] {mode}: {dt*1e3:.0f} ms/fwd "
            f"({n_params/1e6:.0f}M params, init+compile "
            f"{time.perf_counter()-t0:.0f}s)",
            flush=True,
        )
        del params

    if "softmax" in results:
        base = results["softmax"]
        for mode, dt in results.items():
            if mode != "softmax":
                print(f"[wan_bench] {mode} speedup vs softmax: {base/dt:.2f}x",
                      flush=True)
    print(json.dumps({k: round(v * 1e3, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()

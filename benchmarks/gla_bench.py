"""GLA training-op benchmark: fused Pallas chunked GLA vs the jnp chunk form.

The reference's GLA baseline is the fused Triton ``chunk_gla`` kernel
(``mhla_nlp/fla/ops/gla/chunk.py:1014-1160``); here the fused path is the
Pallas assembly in ``kernels/gla_chunk_pallas.py``. This bench produces the
TPU throughput evidence for that path at the 32k north-star scenario
(VERDICT r2 next-step #5): fused vs ``ops.gla_chunk`` (jnp), forward and
fwd+bwd.

Timing methodology per CLAUDE.md: chained iterations (output feeds q) closed
by a host value read, two run lengths differenced, best-of-3.

``--op delta`` benchmarks the gated delta rule instead: the fused
sequential-grid Pallas forward (``kernels/delta_chunk_pallas.py``) vs the
chunked WY jnp op (``ops/delta_rule.py``; reference Triton counterpart
``mhla_nlp/fla/ops/gated_delta_rule/chunk.py``).

Usage: python benchmarks/gla_bench.py [--op gla|delta] [--seq 32768]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=32768)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bwd", action="store_true", help="also time fwd+bwd")
    ap.add_argument("--op", choices=("gla", "delta"), default="gla")
    args = ap.parse_args()

    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS at init, so an env-var
    # "cpu" smoke run would silently land on the REAL chip (and collide
    # with any concurrent bench) — re-assert the request via jax.config
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    b, t, h, d = args.batch, args.seq, args.heads, args.dim
    key = jax.random.PRNGKey(0)
    q = jax.nn.relu(jax.random.normal(key, (b, t, h, d), jnp.bfloat16))
    k = jax.nn.relu(
        jax.random.normal(jax.random.PRNGKey(1), (b, t, h, d), jnp.bfloat16)
    )
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, h, d), jnp.bfloat16)
    # realistic log-decays in (-0.1, 0): e^g close to 1 like trained GLA gates
    gk = -0.05 * jax.random.uniform(
        jax.random.PRNGKey(3), (b, t, h, d), jnp.float32
    )

    if args.op == "delta":
        from mhla_tpu.kernels.delta_chunk_pallas import (
            gated_delta_chunk_fused,
        )
        from mhla_tpu.ops.delta_rule import gated_delta_chunk

        g1 = gk[..., 0]  # [B, T, H] per-head log decay
        beta = jax.nn.sigmoid(
            jax.random.normal(jax.random.PRNGKey(4), (b, t, h), jnp.float32)
        )
        extra = (k, v, g1, beta)

        def fused_op(q_, *arrs):
            return gated_delta_chunk_fused(q_, *arrs, chunk_size=args.chunk)

        def jnp_op(q_, *arrs):
            return gated_delta_chunk(q_, *arrs, chunk_size=args.chunk)

        metric = "delta_fused_vs_jnp_speedup_32k"
    else:
        from mhla_tpu.kernels.gla_chunk_pallas import gla_chunk_fused
        from mhla_tpu.ops.gla_chunk import gla_chunk

        extra = (k, v, gk)

        def fused_op(q_, *arrs):
            return gla_chunk_fused(q_, *arrs, chunk_size=args.chunk)

        def jnp_op(q_, *arrs):
            return gla_chunk(q_, *arrs, chunk_size=args.chunk)

        metric = "gla_fused_vs_jnp_speedup_32k"

    # on-TPU value check at a smaller slice
    ts = min(t, 4096)
    sliced = tuple(a[:, :ts] for a in extra)
    o_pal, _ = fused_op(q[:, :ts], *sliced)
    o_ref, _ = jnp_op(q[:, :ts], *sliced)
    num = jnp.linalg.norm((o_pal - o_ref).astype(jnp.float32))
    den = jnp.linalg.norm(o_ref.astype(jnp.float32)) + 1e-12
    rel = float(num / den)
    assert rel < 2e-2, f"fused/jnp mismatch: rel_rms={rel}"

    def measure(f, n1=5, n2=None):
        n2 = n2 or max(args.iters, n1 + 1)  # difference needs n2 > n1
        y = f(q)
        float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))

        def run(n):
            z = q
            t0 = time.perf_counter()
            for _ in range(n):
                z = f(z)
            float(jnp.sum(jax.tree.leaves(z)[0].astype(jnp.float32)))
            return time.perf_counter() - t0

        run(2)
        return min((run(n2) - run(n1)) / (n2 - n1) for _ in range(3))

    # every big array is a jit ARGUMENT (closures bake them into the HLO as
    # constants -> compile stalls on the relay; CLAUDE.md rule)
    def jit_fwd(op):
        f = jax.jit(lambda x, *arrs: jax.nn.relu(op(x, *arrs)[0]))
        return lambda x: f(x, *extra)

    t_fused = measure(jit_fwd(fused_op))
    t_jnp = measure(jit_fwd(jnp_op))

    out = {
        "metric": metric,
        "value": round(t_jnp / t_fused, 3),
        "unit": "x",
        "fused_ms": round(t_fused * 1e3, 3),
        "jnp_ms": round(t_jnp * 1e3, 3),
        "rel_rms": round(rel, 6),
    }

    if args.bwd:

        def grad_fn(op):
            def loss(x, *arrs):
                o, _ = op(x, *arrs)
                return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6

            g = jax.jit(
                lambda x, *arrs: jax.nn.relu(jax.grad(loss)(x, *arrs))
            )
            return lambda x: g(x, *extra)

        out["fused_fwdbwd_ms"] = round(measure(grad_fn(fused_op)) * 1e3, 3)
        out["jnp_fwdbwd_ms"] = round(measure(grad_fn(jnp_op)) * 1e3, 3)
        # the training-path ratio — what the layers' fused default is
        # justified (or not) by; `value` stays the forward-only ratio
        out["train_speedup"] = round(
            out["jnp_fwdbwd_ms"] / out["fused_fwdbwd_ms"], 3
        )

    print(
        f"[gla_bench op={args.op}] seq={t} "
        f"fused={out['fused_ms']}ms jnp={out['jnp_ms']}ms "
        f"speedup={out['value']}x rel_rms={rel:.2e}",
        file=sys.stderr,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

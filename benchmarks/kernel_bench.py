"""Chunked-MHLA kernel microbench: forward and fwd+bwd at the north-star
scenario (32k tokens, 8 heads, head dim 128, bf16, one chip).

Complements the driver ``bench.py`` (which compares against flash): this
script tracks the kernel against its own roofline — the forward floor is
~1.15 ms at 32k/8h/128d bf16 on v5e (stream accounting in
``kernels/mhla_chunk_pallas.py``), and the hand-scheduled backward
(``_st_path``) targets <= 3.4 ms fwd+bwd.

Timing methodology per CLAUDE.md: chained iterations (output feeds q)
closed by a host value read, two run lengths differenced, best-of-3.

Usage: python benchmarks/kernel_bench.py [--seq 32768] [--iters 20] [--bwd]
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
    args = ap.parse_args()

    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS at init, so an env-var
    # "cpu" smoke run would silently land on the REAL chip (and collide
    # with any concurrent bench) — re-assert the request via jax.config
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from mhla_tpu.kernels import mhla_chunk_fused_flat
    from mhla_tpu.ops import init_causal_mixing_matrix

    b, t, h, d = args.batch, args.seq, args.heads, args.dim
    f = h * d
    key = jax.random.PRNGKey(0)
    q = jax.nn.relu(jax.random.normal(key, (b, t, f), jnp.bfloat16))
    k = jax.nn.relu(
        jax.random.normal(jax.random.PRNGKey(1), (b, t, f), jnp.bfloat16)
    )
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, f), jnp.bfloat16)
    m = init_causal_mixing_matrix(t // args.chunk)

    def measure(fn, n1=5, n2=None):
        n2 = n2 or max(args.iters, n1 + 1)  # difference needs n2 > n1
        y = fn(q)
        float(jnp.sum(y.astype(jnp.float32)))  # compile + warm

        # fresh jittered start per run: repeated identical dispatch chains
        # get replayed by the relay (see bench.py note)
        salt = [0]

        def run(n):
            salt[0] += 1
            z = (q * (1.0 + 2.0**-10 * salt[0])).astype(q.dtype)
            float(jnp.sum(z.astype(jnp.float32)))  # materialize off-clock
            t0 = time.perf_counter()
            for _ in range(n):
                z = fn(z)
            float(jnp.sum(z.astype(jnp.float32)))
            return time.perf_counter() - t0

        run(2)  # settle post-compile relay outliers
        # best-of-7: relay outliers bias upward only; cross-session spread
        # is still ~±0.3 ms (see bench.py note) — trust one-session runs.
        # Non-positive diffs = relay replay garbage; drop them (bench.py).
        diffs = [(run(n2) - run(n1)) / (n2 - n1) for _ in range(7)]
        pos = [d for d in diffs if d > 0]
        assert pos, f"all differenced timings non-positive (relay replay): {diffs}"
        return min(pos)

    # k/v/m are jit ARGUMENTS — closing over them bakes 64 MB streams into
    # the HLO as constants (compile stalls on the relay; CLAUDE.md rule)
    fwd_j = jax.jit(
        lambda x, kk, vv, mm: jax.nn.relu(
            mhla_chunk_fused_flat(
                x, kk, vv, mm, num_heads=h, chunk_size=args.chunk
            )[0]
        )
    )
    t_fwd = measure(lambda x: fwd_j(x, k, v, m))
    # bandwidth-model utilization: ~940 MB of mandatory streams at 32k
    streams_mb = (4 * q.size + 4 * (t // args.chunk) * f * d) * 2 / 1e6
    out = {
        "metric": "mhla_kernel_fwd_ms_32k",
        "value": round(t_fwd * 1e3, 3),
        "unit": "ms",
        "hbm_gbps": round(streams_mb / 1e3 / t_fwd, 1),
    }
    # physics check: v5e HBM peaks at ~819 GB/s — a higher implied rate
    # means the relay replayed dispatches and the sample is garbage
    assert out["hbm_gbps"] < 850, (
        f"implied {out['hbm_gbps']} GB/s exceeds v5e HBM — relay replay"
    )

    if args.bwd:

        def loss(x, kk, vv, mm):
            o, _ = mhla_chunk_fused_flat(
                x, kk, vv, mm, num_heads=h, chunk_size=args.chunk
            )
            return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6

        g_j = jax.jit(
            lambda x, kk, vv, mm: jax.nn.relu(jax.grad(loss)(x, kk, vv, mm))
        )
        out["fwdbwd_ms"] = round(
            measure(lambda x: g_j(x, k, v, m)) * 1e3, 3
        )
        # fwd+bwd can't be cheaper than fwd — a violation means one of the
        # two samples was relay-replayed; fail instead of committing it
        assert out["fwdbwd_ms"] > out["value"], (
            f"fwd+bwd {out['fwdbwd_ms']} < fwd {out['value']} (relay replay)"
        )

    print(
        f"[kernel_bench] seq={t} fwd={out['value']}ms"
        + (f" fwd+bwd={out['fwdbwd_ms']}ms" if args.bwd else "")
        + f" ~{out['hbm_gbps']} GB/s effective",
        file=sys.stderr,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

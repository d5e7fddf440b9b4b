"""Driver benchmark: causal MHLA throughput vs flash (softmax) attention.

Measures the core-op speedup at the BASELINE.md north-star scenario — 32k
tokens, 8 heads, head dim 128, bf16, on the real TPU — and prints ONE JSON
line. ``vs_baseline`` is the measured speedup over the 2.0x driver target
(BASELINE.json: "MHLA Pallas kernel >= 2x softmax-attention throughput at
32k+ tokens").

Timing methodology: through the TPU relay, ``block_until_ready`` can return
before execution and repeated identical dispatches may be replayed, so each
op is timed as a *chained* loop (output feeds input) closed by a host value
read, at two run lengths whose difference cancels the fixed sync overhead.

Usage: python bench.py [--seq 32768] [--heads 8] [--dim 128] [--iters 25]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=32768)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--iters", type=int, default=25)
    args = ap.parse_args()

    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS at init, so an env-var
    # "cpu" smoke run would silently land on the REAL chip (and collide
    # with any concurrent bench) — re-assert the request via jax.config
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from mhla_tpu.kernels import flash_attention, mhla_chunk_fused
    from mhla_tpu.ops import init_causal_mixing_matrix, mhla_chunk

    b, t, h, d = args.batch, args.seq, args.heads, args.dim
    key = jax.random.PRNGKey(0)
    q = jax.nn.relu(jax.random.normal(key, (b, t, h, d), jnp.bfloat16))
    k = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(1), (b, t, h, d), jnp.bfloat16))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, h, d), jnp.bfloat16)
    m = init_causal_mixing_matrix(t // args.chunk)

    # on-TPU value check: Pallas path vs the plain-XLA op (relative RMS);
    # run at a smaller slice to keep the XLA reference graph cheap
    ts = min(t, 4096)
    o_pal, _ = mhla_chunk_fused(q[:, :ts], k[:, :ts], v[:, :ts], m)
    o_ref, _ = mhla_chunk(q[:, :ts], k[:, :ts], v[:, :ts], m)
    num = jnp.linalg.norm((o_pal - o_ref).astype(jnp.float32))
    den = jnp.linalg.norm(o_ref.astype(jnp.float32)) + 1e-12
    max_rel_err = float(num / den)
    # measured 3.3e-3 at bf16; 1e-2 leaves 3x headroom while still tripping
    # on any real numeric regression (VERDICT r3 item 8)
    assert max_rel_err < 1e-2, f"Pallas/XLA mismatch: rel_rms={max_rel_err}"

    def measure(f, x, extra, n1=5, n2=None):
        n2 = n2 or args.iters
        y = f(x, *extra)
        float(jnp.sum(y.astype(jnp.float32)))  # compile + warm

        # every run() starts from a FRESH jittered input so no dispatch
        # chain ever repeats byte-identically: the relay replays repeated
        # identical dispatch sequences (one r5 session measured a 0.45 ms
        # "kernel" at 1781 GB/s — past the physical HBM rate), and the
        # positive-diff filter alone can't catch partial replays. The
        # multiplicative jitter doesn't change the work done.
        salt = [0]

        def run(n):
            salt[0] += 1
            z = (x * (1.0 + 2.0**-10 * salt[0])).astype(x.dtype)
            float(jnp.sum(z.astype(jnp.float32)))  # materialize off-clock
            t0 = time.perf_counter()
            for _ in range(n):
                z = f(z, *extra)
            float(jnp.sum(z.astype(jnp.float32)))  # forces completion
            return time.perf_counter() - t0

        run(2)  # settle post-compile relay outliers
        # best-of-7 of the two-length difference (CLAUDE.md methodology):
        # the relay adds outliers that only bias upward, so the minimum is
        # the estimate closest to true device time. Session-to-session the
        # SAME kernel still spans ~±0.3 ms at 32k (measured 1.07-1.64 ms
        # across four relay sessions) — compare numbers only within one
        # committed run (benchmarks/RESULTS.jsonl). A NON-POSITIVE diff
        # means the relay replayed the short run's dispatches (one r5
        # session emitted fwd_ms=-0.2); those samples are garbage, not a
        # fast kernel — drop them rather than letting min() keep them.
        diffs = [(run(n2) - run(n1)) / (n2 - n1) for _ in range(7)]
        pos = [d for d in diffs if d > 0]
        assert pos, f"all differenced timings non-positive (relay replay): {diffs}"
        return min(pos)

    # chained: output re-enters as q (relu keeps it a valid positive
    # feature). Both ops are fed the projection-natural head-flat
    # [B, T, H*D] layout a model layer would hand them — flash reshapes to
    # its per-head layout internally, MHLA's flat path needs no relayout.
    from mhla_tpu.kernels import mhla_chunk_fused_flat

    qf = q.reshape(b, t, h * d)
    kf = k.reshape(b, t, h * d)
    vf = v.reshape(b, t, h * d)
    f_flash = jax.jit(
        lambda x, kk, vv: jax.nn.relu(
            flash_attention(
                x.reshape(b, t, h, d),
                kk.reshape(b, t, h, d),
                vv.reshape(b, t, h, d),
                causal=True,
            ).reshape(b, t, h * d)
        )
    )
    # m rides as an ARGUMENT like k/v (CLAUDE.md: never close jitted
    # functions over arrays — closed-over constants change codegen)
    f_mhla = jax.jit(
        lambda x, kk, vv, mm: jax.nn.relu(
            mhla_chunk_fused_flat(x, kk, vv, mm, num_heads=h)[0]
        )
    )

    # training path: fwd+bwd through the hand-scheduled supertile backward,
    # so regressions on the training step are driver-visible too
    def loss_fn(x, kk, vv, mm):
        o, _ = mhla_chunk_fused_flat(x, kk, vv, mm, num_heads=h)
        return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6

    f_mhla_bwd = jax.jit(
        lambda x, kk, vv, mm: jax.nn.relu(jax.grad(loss_fn)(x, kk, vv, mm))
    )

    # physics floor for the default scenario: ~940 MB of mandatory HBM
    # streams can't beat v5e's 819 GB/s — a faster sample means the relay
    # replayed part of the chain despite the jittered seeds; re-measure
    # (fresh jitter) instead of emitting garbage or dying on one flake
    floor_s = (
        940e6 / 850e9
        if (args.seq, args.heads, args.dim) == (32768, 8, 128)
        else 0.0
    )

    def measure_floored(f, x, extra):
        for attempt in range(4):
            t_ = measure(f, x, extra)
            if t_ > floor_s:
                return t_
            print(
                f"[bench] {t_*1e3:.3f} ms beats the {floor_s*1e3:.2f} ms "
                f"HBM floor (relay replay) — retry {attempt + 1}",
                file=sys.stderr,
            )
        raise AssertionError(
            f"4 consecutive sub-floor samples ({t_*1e3:.3f} ms) — relay "
            "replaying; rerun in a fresh session"
        )

    t_flash = measure(f_flash, qf, (kf, vf))
    t_mhla = measure_floored(f_mhla, qf, (kf, vf, m))
    t_mhla_bwd = measure_floored(f_mhla_bwd, qf, (kf, vf, m))

    speedup = t_flash / t_mhla
    print(
        f"[bench] seq={t} flash={t_flash*1e3:.2f}ms mhla={t_mhla*1e3:.2f}ms "
        f"mhla_fwdbwd={t_mhla_bwd*1e3:.2f}ms tok/s={b*t/t_mhla:,.0f} "
        f"rel_rms_vs_xla={max_rel_err:.2e}",
        file=sys.stderr,
    )
    # physics floor: ~940 MB of mandatory HBM streams at the default 32k
    # scenario can't move faster than v5e's 819 GB/s — a faster "fwd" means
    # the relay replayed part of the dispatch chain (see measure())
    if (args.seq, args.heads, args.dim) == (32768, 8, 128):
        floor_ms = 940 / 850  # small tolerance over the nominal rate
        assert t_mhla * 1e3 > floor_ms, (
            f"fwd {t_mhla*1e3:.3f} ms beats the {floor_ms:.2f} ms HBM floor "
            "— relay replay; rerun"
        )
    print(
        json.dumps(
            {
                "metric": "mhla_vs_flash_speedup_32k",
                "value": round(speedup, 3),
                "unit": "x",
                "vs_baseline": round(speedup / 2.0, 3),
                "max_rel_err": round(max_rel_err, 6),
                "fwd_ms": round(t_mhla * 1e3, 3),
                "fwdbwd_ms": round(t_mhla_bwd * 1e3, 3),
                "flash_ms": round(t_flash * 1e3, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

"""LM training-step throughput (fwd+bwd+optimizer) on the real TPU.

BASELINE.md scenario 1 is the 340M MHLA LM at ctx 2048; this measures the
full jitted train step (fused Pallas kernels fwd+bwd, fused linear CE,
AdamW) in tokens/second on one chip — the training-side counterpart to
bench.py (prefill op) and decode_bench.py (serving).

Usage: python benchmarks/train_bench.py [--batch 8] [--seq 2048] [--layers 24]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--ablate",
        action="store_true",
        help="also time fwd-only and fwd+bwd (no optimizer) to attribute "
        "the step-time budget",
    )
    ap.add_argument(
        "--attn",
        default="mhla",
        help="attention family (attn_extends): mhla, gla, mamba2, "
        "gated_deltanet, ... — mamba2 rides the fused GLA kernels via the "
        "SSD<->GLA duality",
    )
    args = ap.parse_args()

    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS at init, so an env-var
    # "cpu" smoke run would silently land on the REAL chip (and collide
    # with any concurrent bench) — re-assert the request via jax.config
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import optax

    from mhla_tpu.models import MHLAForCausalLM, MHLALMConfig

    cfg = MHLALMConfig(
        dtype=jnp.bfloat16,
        num_hidden_layers=args.layers,
        max_position_embeddings=max(2048, args.seq),
        attn_extends=args.attn,
    )
    # activation memory: 24 layers x 32k ctx needs per-block remat; so does
    # mamba2 even at 2k (2x-expanded inner width doubles every activation
    # stream and the fused-GLA backward saves supertile-entry states per
    # layer on top — batch 4 x 2048 measured 16.2G > the 15.75G HBM)
    model = MHLAForCausalLM(
        cfg, remat=args.seq >= 8192 or args.attn == "mamba2"
    )
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (args.batch, args.seq), 0, cfg.vocab_size)
    params = jax.jit(model.init)(rng, ids[:1, :256])  # small init trace
    n_params = sum(x.size for x in jax.tree.leaves(params))

    tx = optax.adamw(3e-4, weight_decay=0.01)
    opt_state = jax.jit(tx.init)(params)

    from mhla_tpu.models.gla_lm import fused_lm_loss

    def loss_fn(p, batch):
        # fused linear+CE: logits never materialize (534 MB at this shape)
        return fused_lm_loss(model, p, batch)

    # donate params + opt state like the real trainer (train/trainer.py:182)
    # — without donation the optimizer pass allocates fresh buffers and the
    # update costs ~3x its stream floor (measured 37.5 vs ~12 ms at 341M)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, o, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    params, opt_state, loss = step(params, opt_state, ids)
    jax.block_until_ready(loss)

    def run(n):
        nonlocal params, opt_state
        batch = ids
        t0 = time.perf_counter()
        for _ in range(n):
            params, opt_state, loss = step(params, opt_state, batch)
        float(loss)
        return time.perf_counter() - t0

    n1, n2 = 3, 3 + args.iters
    t1 = min(run(n1) for _ in range(3))
    t2 = min(run(n2) for _ in range(3))
    dt = (t2 - t1) / args.iters
    tok_s = args.batch * args.seq / dt
    # model-FLOPs MFU (6N per token, the PaLM convention — attention FLOPs
    # excluded, so this is the conservative number) against v5e bf16 peak
    mfu = tok_s * 6 * n_params / 197e12
    out = {
        "metric": "lm_train_tok_per_s",
        "value": round(tok_s, 0),
        "unit": "tok/s",
        "batch": args.batch,
        "seq": args.seq,
        "mfu": round(mfu, 3),
        "step_ms": round(dt * 1e3, 1),
    }
    if args.attn != "mhla":
        out["attn"] = args.attn

    if args.ablate:
        # attribute the step: fwd-only, fwd+bwd (optimizer excluded)
        fwd_j = jax.jit(loss_fn)
        fb_j = jax.jit(lambda p, b: jax.value_and_grad(loss_fn)(p, b))

        def time_fn(f):
            jax.block_until_ready(f(params, ids))  # compile + warm

            def runn(n):
                # chain each call through the batch (a zero derived from the
                # previous output) — identical repeated dispatches get
                # REPLAYED by the relay (0.2 ms "forwards", CLAUDE.md)
                b_ = ids
                t0 = time.perf_counter()
                for _ in range(n):
                    r = f(params, b_)
                    lead = jax.tree.leaves(r)[0]
                    b_ = ids + (jnp.sum(lead) * 0).astype(ids.dtype)
                jax.block_until_ready(b_)
                return time.perf_counter() - t0

            runn(2)
            return min(
                (runn(n2) - runn(n1)) / (n2 - n1) for _ in range(3)
            )

        out["fwd_ms"] = round(time_fn(fwd_j) * 1e3, 1)
        out["fwdbwd_ms"] = round(time_fn(fb_j) * 1e3, 1)
        out["opt_ms"] = round(out["step_ms"] - out["fwdbwd_ms"], 1)

    print(
        f"[train_bench] {n_params/1e6:.0f}M params batch={args.batch} "
        f"seq={args.seq}: {dt*1e3:.1f} ms/step = {tok_s:,.0f} tok/s "
        f"(~{mfu:.0%} MFU)"
        + (
            f" fwd={out['fwd_ms']}ms fwd+bwd={out['fwdbwd_ms']}ms"
            if args.ablate
            else ""
        ),
        file=sys.stderr,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

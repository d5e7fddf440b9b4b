"""LM training-step throughput (fwd+bwd+optimizer) on the real TPU.

BASELINE.md scenario 1 is the 340M MHLA LM at ctx 2048; this measures the
full jitted train step (fused Pallas kernels fwd+bwd, fused linear CE,
AdamW) in tokens/second on one chip — the training-side counterpart to
bench.py (prefill op) and decode_bench.py (serving).

Usage: python benchmarks/train_bench.py [--batch 8] [--seq 2048] [--layers 24]
"""

from __future__ import annotations

import argparse
import json
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from mhla_tpu.models import MHLAForCausalLM, MHLALMConfig

    cfg = MHLALMConfig(
        dtype=jnp.bfloat16,
        num_hidden_layers=args.layers,
        max_position_embeddings=max(2048, args.seq),
    )
    # activation memory: 24 layers x 32k ctx needs per-block remat
    model = MHLAForCausalLM(cfg, remat=args.seq >= 8192)
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

    @jax.jit
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
    print(
        f"[train_bench] {n_params/1e6:.0f}M params batch={args.batch} "
        f"seq={args.seq}: {dt*1e3:.1f} ms/step = {tok_s:,.0f} tok/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "lm_train_tok_per_s",
                "value": round(tok_s, 0),
                "unit": "tok/s",
                "batch": args.batch,
                "seq": args.seq,
            }
        )
    )


if __name__ == "__main__":
    main()

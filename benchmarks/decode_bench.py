"""Autoregressive decode throughput for the MHLA LM.

Measures tokens/second of the O(1)-per-token recurrent decode path on the
340M reference architecture (prefill 2048 + decode), the serving-side
counterpart to bench.py's prefill-throughput number.

Usage: python benchmarks/decode_bench.py [--batch 1] [--new 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prefill", type=int, default=2048)
    ap.add_argument("--new", type=int, default=64)
    args = ap.parse_args()

    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS at init, so an env-var
    # "cpu" smoke run would silently land on the REAL chip (and collide
    # with any concurrent bench) — re-assert the request via jax.config
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from mhla_tpu.models import MHLAForCausalLM, MHLALMConfig

    from mhla_tpu.models.generation import cast_floating

    cfg = MHLALMConfig(dtype=jnp.bfloat16)  # 340M reference architecture
    model = MHLAForCausalLM(cfg)
    ids = jnp.zeros((args.batch, args.prefill), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    # serving weights in bf16: batch-1 decode is weight-bandwidth-bound, so
    # fp32 weights would double the per-token latency
    params = cast_floating(params, jnp.bfloat16)

    prefill = jax.jit(lambda p, i: model.apply(p, i, use_cache=True))
    logits, states = prefill(params, ids)
    jax.block_until_ready(logits)

    # the serving decode loop is ONE jitted scan: per-token host dispatches
    # would dominate through the TPU relay (and waste host time anywhere)
    @partial(jax.jit, static_argnames=("n",), donate_argnums=(2,))
    def decode_n(p, tok, states, n):
        def body(carry, _):
            tok, states = carry
            logits, states = model.apply(p, tok, states, use_cache=True)
            tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
            return (tok, states), tok[:, 0]

        (_, states), toks = jax.lax.scan(body, (tok, states), None, length=n)
        return toks, states

    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    n1, n2 = args.new, 3 * args.new
    toks, states = decode_n(params, tok, states, n1)  # compile short
    jax.block_until_ready(toks)
    toks, states = decode_n(params, tok, states, n2)  # compile long
    jax.block_until_ready(toks)

    # steady-state per-token latency: difference two run lengths (the fixed
    # per-dispatch sync through the TPU relay cancels), best of 3
    def timed(n):
        nonlocal states
        t0 = time.perf_counter()
        toks, states = decode_n(params, tok, states, n)
        float(jnp.sum(toks.astype(jnp.float32)))  # host barrier
        return time.perf_counter() - t0

    t1 = min(timed(n1) for _ in range(3))
    t2 = min(timed(n2) for _ in range(3))
    dt = (t2 - t1) / (n2 - n1)

    tok_s = args.batch / dt
    print(
        f"[decode_bench] batch={args.batch} {dt*1e3:.2f} ms/step "
        f"= {tok_s:,.0f} tok/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "lm_decode_tok_per_s",
                "value": round(tok_s, 1),
                "unit": "tok/s",
                "batch": args.batch,
            }
        )
    )


if __name__ == "__main__":
    main()

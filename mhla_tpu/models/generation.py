"""Autoregressive generation for the MHLA LM.

Functional replacement for the reference's HF generation mixin
(``mhla_nlp/fla/models/utils.py:385``, ``FLAGenerationMixin``): prefill with
the chunked op, then step the O(1) recurrent decode path.

The serving loop is ONE jitted ``lax.scan`` — per-token host dispatches cost
~10-100 ms each through a TPU relay and waste host time everywhere, so the
whole decode runs as a single XLA program with donated cache buffers. A
Python-loop fallback exists only for custom stopping logic (``stop_fn``)
that must inspect tokens on the host mid-decode.

For serving, cast params to bf16 first (``cast_floating(params,
jnp.bfloat16)``): batch-1 decode is weight-bandwidth-bound, so fp32 weights
double the per-token latency.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def cast_floating(tree: Any, dtype=jnp.bfloat16) -> Any:
    """Cast every floating leaf of a pytree (params) to ``dtype``."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def _pad_softmax_caches(states, max_length: int):
    """Grow softmax-layer KV caches from prefill length to max_length."""
    out = []
    for s in states:
        if isinstance(s, tuple) and len(s) == 3 and not hasattr(s, "_fields"):
            k, v, t = s
            pad = max_length - k.shape[1]
            k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
            out.append((k, v, jnp.asarray(t, jnp.int32)))
        else:
            out.append(s)
    return out


def _make_sampler(temperature: float, top_k: Optional[int]):
    def sample(logits, rng):
        logits = logits[:, -1].astype(jnp.float32)
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1)
        logits = logits / temperature
        if top_k is not None:
            kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        return jax.random.categorical(rng, logits, axis=-1)

    return sample


def generate(
    model,
    params,
    input_ids: jax.Array,  # [B, T] int32
    max_new_tokens: int = 32,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    eos_token_id: Optional[int] = None,
    rng: Optional[jax.Array] = None,
    max_length: Optional[int] = None,
    stop_fn: Optional[Callable[[jax.Array], bool]] = None,
) -> jax.Array:
    """Greedy (temperature=0) or sampled decoding. Returns [B, T + new].

    ``stop_fn(tokens_so_far) -> bool`` forces the Python-loop path (host
    inspection per token); otherwise the decode is one fused scan.
    """
    b, t = input_ids.shape
    max_length = max_length or (t + max_new_tokens)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    prefill = jax.jit(lambda p, ids: model.apply(p, ids, use_cache=True))
    logits, states = prefill(params, input_ids)
    states = _pad_softmax_caches(states, max_length)
    sample = _make_sampler(temperature, top_k)

    rng, sub = jax.random.split(rng)
    tok0 = sample(logits, sub)

    if stop_fn is None:
        eos = -1 if eos_token_id is None else eos_token_id

        @partial(jax.jit, static_argnames=("n",), donate_argnums=(2,))
        def decode_n(params, tok, states, rng, n):
            def body(carry, _):
                tok, states, rng, finished = carry
                logits, states = model.apply(
                    params, tok[:, None], states, use_cache=True
                )
                rng, sub = jax.random.split(rng)
                nxt = sample(logits, sub)
                finished = finished | (tok == eos)
                nxt = jnp.where(finished, eos, nxt)
                return (nxt, states, rng, finished), nxt

            finished = jnp.zeros((tok.shape[0],), bool) & (eos >= 0)
            (_, states, _, _), toks = jax.lax.scan(
                body, (tok, states, rng, finished), None, length=n
            )
            return toks.T  # [B, n]

        toks = decode_n(params, tok0, states, rng, max_new_tokens - 1)
        return jnp.concatenate([input_ids, tok0[:, None], toks], axis=1)

    # host-inspected loop (custom stopping logic)
    @partial(jax.jit, donate_argnums=(2,))
    def step(params, tok, states):
        # params passed explicitly: a closure would bake 100M+ weights into
        # the HLO as constants and stall compilation. states donated: the
        # decode caches are hundreds of MB and must update in place.
        return model.apply(params, tok[:, None], states, use_cache=True)

    tok = tok0
    out = [input_ids, tok[:, None]]
    finished = jnp.zeros((b,), bool) if eos_token_id is not None else None
    for _ in range(max_new_tokens - 1):
        logits, states = step(params, tok, states)
        rng, sub = jax.random.split(rng)
        tok = sample(logits, sub)
        if eos_token_id is not None:
            finished = finished | (out[-1][:, 0] == eos_token_id)
            tok = jnp.where(finished, eos_token_id, tok)
        out.append(tok[:, None])
        if finished is not None and bool(finished.all()):
            break
        if stop_fn(jnp.concatenate(out, axis=1)):
            break
    return jnp.concatenate(out, axis=1)

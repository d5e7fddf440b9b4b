"""Autoregressive generation for the MHLA LM.

Functional replacement for the reference's HF generation mixin
(``mhla_nlp/fla/models/utils.py:385``, ``FLAGenerationMixin``): prefill with
the chunked op, then step the O(1) recurrent decode path. The per-step
function is jit-compiled once (stable state pytree); the token loop runs in
Python so arbitrary stopping logic can hook in.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


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
) -> jax.Array:
    """Greedy (temperature=0) or sampled decoding. Returns [B, T + new]."""
    b, t = input_ids.shape
    max_length = max_length or (t + max_new_tokens)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    prefill = jax.jit(lambda p, ids: model.apply(p, ids, use_cache=True))
    logits, states = prefill(params, input_ids)
    states = _pad_softmax_caches(states, max_length)

    @jax.jit
    def sample(logits, rng):
        logits = logits[:, -1].astype(jnp.float32)
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1)
        logits = logits / temperature
        if top_k is not None:
            kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        return jax.random.categorical(rng, logits, axis=-1)

    from functools import partial

    @partial(jax.jit, donate_argnums=(2,))
    def step(params, tok, states):
        # params passed explicitly: a closure would bake 100M+ weights into
        # the HLO as constants and stall compilation. states donated: the
        # decode caches are hundreds of MB and must update in place.
        return model.apply(params, tok[:, None], states, use_cache=True)

    rng, sub = jax.random.split(rng)
    tok = sample(logits, sub)
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
    return jnp.concatenate(out, axis=1)

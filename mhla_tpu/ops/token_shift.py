"""Token shift: the RWKV-style delta between each token and its predecessor.

TPU equivalent of the reference's Triton token-shift kernels
(``mhla_nlp/fla/modules/token_shift.py:15-48`` reference semantics,
``:512-547`` public API): ``y[t] = x[t-1] - x[t]`` with a zero (or cached)
predecessor at position 0. On TPU this is a pad + subtract that XLA fuses
into one elementwise pass — no kernel needed; the per-document reset rides
``segment_ids`` like every other varlen op in this repo (the reference uses
cu_seqlens, ``token_shift_fwd_kernel_short`` IS_VARLEN branch).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp


def token_shift(
    x: jax.Array,  # [B, T, D]
    segment_ids: Optional[jax.Array] = None,  # [B, T] packed-varlen docs
    cache: Optional[jax.Array] = None,  # [B, D] last token of previous call
    output_cache: bool = False,
) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
    """``y[t] = x[t-1] - x[t]``; position 0 reads ``cache`` (else zero).

    With ``segment_ids``, each document's first token sees a zero
    predecessor (documents never leak into each other; reference
    ``token_shift.py`` cu_seqlens mode). ``cache`` carries decode state
    across calls — the last real token of the previous step — and is
    mutually exclusive with ``segment_ids`` (one document per row when
    decoding). Returns ``y`` or ``(y, new_cache)`` with ``new_cache``
    [B, D] = the final token, ready to feed the next call.
    """
    if cache is not None and segment_ids is not None:
        raise ValueError("cache (decode) and segment_ids (packed varlen) "
                         "are mutually exclusive")
    shifted = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0)))
    if cache is not None:
        cache2 = cache.reshape(x.shape[0], 1, x.shape[-1]).astype(x.dtype)
        shifted = jnp.concatenate([cache2, x[:, :-1]], axis=1)
    if segment_ids is not None:
        is_start = jnp.concatenate(
            [
                jnp.ones_like(segment_ids[:, :1], bool),
                segment_ids[:, 1:] != segment_ids[:, :-1],
            ],
            axis=1,
        )
        shifted = jnp.where(is_start[..., None], 0.0, shifted).astype(x.dtype)
    y = shifted - x
    if output_cache:
        return y, x[:, -1]
    return y

"""Non-causal blockwise MHLA operator (vision: ViT / DiT / video).

All vision variants share one functional core (reference instantiations:
``MHLA_Normed_Torch`` at ``mhla_image_classification/.../attention/mhla.py:264-289``,
``MHLA4DiT`` at ``mhla_dit/mhla/mhla.py:251-275``, ``MHLA_Video_Uni`` at
``mhla_videogen/.../wan/mhla_utils.py:292-366``):

    kv_j       = k_j^T v_j                        per block j   [Dk, Dv]
    kv~_i      = sum_j M[i, j] kv_j               block mixing  (1x1 conv -> matmul)
    z_i        = sum_j M[i, j] (q_j @ k_j.sum)    mixed normalizer
    o_i        = (q_i @ kv~_i) / (z_i + eps)

NOTE the normalizer's index: it is ``q_j @ k_j.sum`` — the mixing matrix is
applied to the *per-block* scalar field ``q_j @ k_sum_j``, so block i's
denominator mixes OTHER blocks' query readouts, not q_i against other
blocks' key sums. This exactly reproduces the reference's
``block_attn(matmul(q, k.sum(-2)))`` (1x1 conv over the block axis of a
tensor already indexed by the query's own block). Do NOT "fix" it to
``q_i @ (sum_j M[i,j] k_j.sum)`` — that changes the numerics vs the
reference.

with q, k already positive (relu(norm(.)) + eps upstream). The video variant
uses RoPE'd q/k for the kv path and the *no-RoPE* k for the normalizer, which
is why this op takes separate (q, k) for numerator and (q_nope, k_nope) for
the denominator.

Everything is batched matmuls on the MXU; fp32 accumulation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("normalize", "eps"))
def mhla_blockwise(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mixing_matrix: jax.Array,
    q_nope: Optional[jax.Array] = None,
    k_nope: Optional[jax.Array] = None,
    normalize: bool = True,
    eps: float = 1e-6,
) -> jax.Array:
    """Blockwise non-causal MHLA.

    Args:
      q, k: [B*, N, C, Dk] — N blocks of C tokens each (positive features;
        RoPE'd in the video variant). Leading dims are batch x heads.
      v:    [B*, N, C, Dv]
      mixing_matrix: [N, N] block mixing weights (fp32).
      q_nope, k_nope: optional separate q/k for the normalizer (video:
        pre-RoPE). Default: q, k.
      normalize: apply the mixed-normalizer division (reference
        ``normalize_out``; default True).

    Returns:
      o: [B*, N, C, Dv] in the input dtype (fp32 compute).
    """
    in_dtype = q.dtype
    f32 = jnp.float32
    q, k, v = q.astype(f32), k.astype(f32), v.astype(f32)
    m = mixing_matrix.astype(f32)

    # Per-block KV state + mixing:  [.., N, Dk, Dv]
    kv = jnp.einsum("...nck,...ncv->...nkv", k, v)
    kv = jnp.einsum("ij,...jkv->...ikv", m, kv)
    out = jnp.einsum("...nck,...nkv->...ncv", q, kv)

    if normalize:
        qn = q if q_nope is None else q_nope.astype(f32)
        kn = k if k_nope is None else k_nope.astype(f32)
        # k_sum per block, q @ k_sum, then mix over blocks:  [.., N, C]
        k_sum = jnp.sum(kn, axis=-2)  # [.., N, Dk]
        z = jnp.einsum("...nck,...nk->...nc", qn, k_sum)
        z = jnp.einsum("ij,...jc->...ic", m, z) + eps
        out = out / z[..., None]

    return out.astype(in_dtype)


@partial(jax.jit, static_argnames=("normalize", "eps", "compute_dtype"))
def mhla_blockwise_mh(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mixing_matrix: jax.Array,
    q_nope: Optional[jax.Array] = None,
    k_nope: Optional[jax.Array] = None,
    normalize: bool = True,
    eps: float = 1e-6,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Multi-head layout blockwise MHLA: q, k [B, N, C, H, Dk], v [B, N, C, H, Dv].

    Same math as :func:`mhla_blockwise`, with the head axis kept in the
    token-natural position so no relayout transpose is needed on TPU (the
    head axis rides as an einsum batch dimension).

    ``compute_dtype``: matmul input precision. Default fp32 (the reference's
    fp32-attention island); ``bfloat16`` runs the matmuls on the MXU at bf16
    with fp32 accumulation — normalizer division and sums stay fp32.
    """
    in_dtype = q.dtype
    f32 = jnp.float32
    cdt = compute_dtype or f32
    q, k, v = q.astype(cdt), k.astype(cdt), v.astype(cdt)
    m = mixing_matrix.astype(cdt)

    kv = jnp.einsum("bnchk,bnchv->bnhkv", k, v, preferred_element_type=f32)
    kv = jnp.einsum(
        "ij,bjhkv->bihkv", m, kv.astype(cdt), preferred_element_type=f32
    )
    out = jnp.einsum(
        "bnchk,bnhkv->bnchv", q, kv.astype(cdt), preferred_element_type=f32
    )

    if normalize:
        qn = q if q_nope is None else q_nope.astype(cdt)
        kn = k if k_nope is None else k_nope.astype(cdt)
        k_sum = jnp.sum(kn.astype(f32), axis=2)  # [B, N, H, Dk] fp32 sum
        z = jnp.einsum(
            "bnchk,bnhk->bnch", qn, k_sum.astype(cdt), preferred_element_type=f32
        )
        z = jnp.einsum(
            "ij,bjch->bich", m.astype(f32), z, preferred_element_type=f32
        ) + eps
        out = out / z[..., None]
    return out.astype(in_dtype)

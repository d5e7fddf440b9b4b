"""Block-axis context parallelism (CP) for MHLA.

The reference has no sequence/context parallelism (SURVEY.md section 2.4) —
long context is handled algorithmically. MHLA's structure enables a
TPU-friendly CP the reference never built: shard the *chunk/block axis*
across devices. Each device computes its local per-chunk KV states
(S_j = k_j^T v_j, a [Dk, Dv] matrix per chunk per head — tiny), all-gathers
the state stack over ICI, applies its rows of the mixing matrix, and
produces outputs for its local chunks only. Communication is
O(N * H * Dk * Dv) per layer — independent of tokens-per-chunk — versus
ring-attention's O(T * H * D) KV passes.

Causal and non-causal (vision) variants. Built on ``shard_map`` over a named
mesh axis; tokens enter sharded [B, T/devices, H, D] on that axis.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def mhla_chunk_cp(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mixing_matrix: jax.Array,
    mesh: Mesh,
    axis: str = "fsdp",
    chunk_size: int = 64,
) -> jax.Array:
    """Causal chunked MHLA with the chunk axis sharded over ``axis``.

    q, k: [B, T, H, Dk]; v: [B, T, H, Dv]; T must divide evenly into
    chunks and devices. Returns o [B, T, H, Dv] sharded the same way.
    """
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    n_dev = mesh.shape[axis]
    n = t // chunk_size
    assert n % n_dev == 0, f"{n} chunks not divisible by {n_dev} devices"
    n_local = n // n_dev
    scale = dk**-0.5
    f32 = jnp.float32
    m = jnp.asarray(mixing_matrix).reshape(
        mixing_matrix.shape[0], mixing_matrix.shape[1]
    )[:n, :n].astype(f32)

    def local_fn(q_l, k_l, v_l, m_full):
        # q_l: [B, T/n_dev, H, Dk] — n_local chunks of this device
        r = jax.lax.axis_index(axis)
        cdt = q_l.dtype
        qc = (q_l.reshape(b, n_local, chunk_size, h, dk).astype(f32) * scale).astype(cdt)
        kc = k_l.reshape(b, n_local, chunk_size, h, dk)
        vc = v_l.reshape(b, n_local, chunk_size, h, dv)

        # local chunk states, then all-gather the tiny state stack over ICI
        states_l = jnp.einsum(
            "bnchk,bnchv->nbhkv", kc, vc, preferred_element_type=f32
        )  # [n_local, B, H, Dk, Dv]
        states = jax.lax.all_gather(
            states_l, axis, axis=0, tiled=True
        )  # [N, B, H, Dk, Dv]

        # this device's rows of the mixing matrix (strict lower part)
        row0 = r * n_local
        m_rows = jax.lax.dynamic_slice_in_dim(m_full, row0, n_local, axis=0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n_local, n), 1)
        row = row0 + jax.lax.broadcasted_iota(jnp.int32, (n_local, n), 0)
        m_strict = jnp.where(col < row, m_rows, 0.0)
        m_diag = jnp.diagonal(
            jax.lax.dynamic_slice(m_rows, (0, row0), (n_local, n_local))
        )

        mixed = jnp.einsum(
            "in,nbhkv->bihkv", m_strict.astype(cdt), states.astype(cdt),
            preferred_element_type=f32,
        )
        o_inter = jnp.einsum(
            "bnchk,bnhkv->bnchv", qc, mixed.astype(cdt), preferred_element_type=f32
        )
        attn = jnp.einsum("bnchk,bnmhk->bnhcm", qc, kc, preferred_element_type=f32)
        tril = jnp.tril(jnp.ones((chunk_size, chunk_size), f32))
        attn = (attn * tril).astype(cdt)
        o_intra = jnp.einsum(
            "bnhcm,bnmhv->bnchv", attn, vc, preferred_element_type=f32
        ) * m_diag[None, :, None, None, None]
        o = (o_inter + o_intra).reshape(b, n_local * chunk_size, h, dv)
        return o.astype(q_l.dtype)

    spec = P(None, axis, None, None)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec,
    )
    return fn(q, k, v, m)


def mhla_blockwise_cp(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mixing_matrix: jax.Array,
    mesh: Mesh,
    axis: str = "fsdp",
    q_nope: Optional[jax.Array] = None,
    k_nope: Optional[jax.Array] = None,
    normalize: bool = True,
    eps: float = 1e-6,
) -> jax.Array:
    """Non-causal blockwise MHLA with the block axis N sharded over ``axis``.

    q, k: [B, N, C, H, Dk]; v: [B, N, C, H, Dv]. Both the per-block KV
    states and the per-block normalizer contributions are all-gathered
    (each is tiny relative to tokens).
    """
    b, n, c, h, dk = q.shape
    dv = v.shape[-1]
    n_dev = mesh.shape[axis]
    assert n % n_dev == 0
    n_local = n // n_dev
    f32 = jnp.float32
    m = jnp.asarray(mixing_matrix).astype(f32)

    spec = P(None, axis, None, None, None)
    qn = q if q_nope is None else q_nope
    kn = k if k_nope is None else k_nope

    def local_fn_nope(q_l, k_l, v_l, qn_l, kn_l, m_full):
        r = jax.lax.axis_index(axis)
        qf, kf, vf = q_l.astype(f32), k_l.astype(f32), v_l.astype(f32)
        kv_l = jnp.einsum("bnchk,bnchv->nbhkv", kf, vf)
        kv = jax.lax.all_gather(kv_l, axis, axis=0, tiled=True)
        m_rows = jax.lax.dynamic_slice_in_dim(m_full, r * n_local, n_local, 0)
        kv_mix = jnp.einsum("in,nbhkv->bihkv", m_rows, kv)
        out = jnp.einsum("bnchk,bnhkv->bnchv", qf, kv_mix)
        if normalize:
            z_l = jnp.einsum(
                "bnchk,bnhk->nbch",
                qn_l.astype(f32),
                jnp.sum(kn_l.astype(f32), axis=2),
            )
            z = jax.lax.all_gather(z_l, axis, axis=0, tiled=True)
            z_mix = jnp.einsum("in,nbch->bich", m_rows, z) + eps
            out = out / z_mix[..., None]
        return out.astype(q_l.dtype)

    fn = shard_map(
        local_fn_nope, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, P()), out_specs=spec,
    )
    return fn(q, k, v, qn, kn, m)

"""Block-sparse (radial / n-log-n) video attention on TPU.

The reference's alternative sparse path runs flex-attention or
block-sparse-attention CUDA kernels under a precomputed "n log n" /
"radial" frame-distance mask (``mhla_videogen/diffusion/model/wan/
model.py:258-281`` dispatches on ``block_mask``; ``inference.py:706-770``
builds the mask via the external ``tools.attn_mask.gen_nlogn_mask`` and
names it "Aura/radial attention"). The TPU-native vehicle is the Pallas
splash-attention kernel (block-sparse flash): the mask is STATIC per video
geometry, so its block-level sparsity structure is computed once on host
and compiled into the kernel's fetch schedule — skipped blocks cost
neither FLOPs nor HBM reads, exactly like the CUDA block-sparse kernel.

Mask design (the reference's generator lives outside its repo; this
follows the radial-attention structure its artifacts document — an
O(n log n) frame-distance decay, full attention on the frame diagonal):
tokens are frame-major (token i sits in frame ``i // hw`` at spatial
index ``i % hw``); a query in frame f attends to all of frame g when
``|f - g| <= 1``, and to a spatial band that HALVES per octave of
temporal distance beyond that:

    allowed(i, j) = |s_i - s_j| < hw / 2^floor(log2(|f_i - f_j|))

Summing ``hw / 2^log2(d)`` over frame distances d gives the n-log-n
total-edge count the reference names the mask after.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as _splash_kernel,
    splash_attention_mask as _splash_mask,
)


def radial_window(dist: np.ndarray, hw: int) -> np.ndarray:
    """Spatial bandwidth for temporal distance ``dist`` (vectorized):
    full frame at dist<=1, then halved per octave of distance."""
    d = np.maximum(dist, 1)
    octave = np.floor(np.log2(d)).astype(np.int64)
    return np.maximum(hw >> octave, 0)


def _radial_block(
    qi: np.ndarray, ki: np.ndarray, seq_len: int, num_frames: int
) -> np.ndarray:
    """Mask values for the (query rows qi) x (key cols ki) tile. Padding
    tokens (index >= seq_len) attend only to themselves — fully masked
    query rows would make the softmax degenerate (outputs are sliced off),
    matching the reference's padded flex mask (``model.py:2063-2069``)."""
    hw = seq_len // num_frames
    qc = np.minimum(qi, seq_len - 1)
    kc = np.minimum(ki, seq_len - 1)
    fq, sq = qc // hw, qc % hw
    fk, sk = kc // hw, kc % hw
    dist = np.abs(fq[:, None] - fk[None, :])
    win = radial_window(dist, hw)
    mask = np.abs(sq[:, None] - sk[None, :]) < win
    mask |= dist <= 1
    real_q = qi < seq_len
    real_k = ki < seq_len
    mask &= real_q[:, None] & real_k[None, :]
    mask |= (~real_q[:, None]) & (qi[:, None] == ki[None, :])
    return mask


class RadialMask(_splash_mask.Mask):
    """Lazy radial mask for the splash kernel: tiles are computed on
    demand during MaskInfo construction, so the full [T, T] boolean array
    (~1 GB, with multi-GB int temporaries, at 31.5k tokens) never
    materializes."""

    def __init__(self, seq_len: int, num_frames: int, pad_to: int):
        self.seq_len = seq_len
        self.num_frames = num_frames
        self.pad_to = pad_to

    @property
    def shape(self):
        return (self.pad_to, self.pad_to)

    def __getitem__(self, idx) -> np.ndarray:
        qs, ks = idx
        qi = np.arange(self.pad_to)[qs]
        ki = np.arange(self.pad_to)[ks]
        return _radial_block(qi, ki, self.seq_len, self.num_frames)

    def __eq__(self, other):
        if not isinstance(other, RadialMask):
            return NotImplemented
        return (self.seq_len, self.num_frames, self.pad_to) == (
            other.seq_len, other.num_frames, other.pad_to
        )

    def __hash__(self):
        return hash((type(self), self.seq_len, self.num_frames, self.pad_to))


def radial_mask_dense(
    seq_len: int, num_frames: int, pad_to: Optional[int] = None
) -> np.ndarray:
    """Dense boolean [T, T] radial mask (host-side; for the XLA fallback
    and tests — use :class:`RadialMask` at production scale)."""
    n = pad_to if pad_to is not None and pad_to > seq_len else seq_len
    idx = np.arange(n)
    return _radial_block(idx, idx, seq_len, num_frames)


# Tests flip this to exercise the splash kernel in interpret mode on CPU
# (the production CPU path is the masked-SDPA fallback below).
FORCE_INTERPRET = False


# Splash block sizes (the backward path). 512x512 measured best of the
# swept configs at 31.5k (77.6 ms bf16 vs 110 ms at 256x256 and 303 ms at
# the stock 128x128) but still LOSES to dense 512-block flash (47.5 ms):
# a full-mask splash run costs 51 ms — its per-block throughput is fine —
# so the loss is the radial mask itself: at 512-block granularity the
# band boundaries leave ~85% of blocks partially occupied, and partial
# blocks stream their stored bool masks from HBM and apply them per
# element. That is why the FORWARD uses the custom analytic-mask kernel
# below instead; splash remains as the differentiable path.
BLOCK_Q = 512
BLOCK_KV = 512


@functools.lru_cache(maxsize=8)
def _build_splash_kernel(
    seq_len: int,
    num_frames: int,
    num_heads: int,
    head_dim: int,
    pad_to: int,
    interpret: bool,
    block_q: int = None,
    block_kv: int = None,
):
    block_q = block_q or BLOCK_Q
    block_kv = block_kv or BLOCK_KV
    mask = RadialMask(seq_len, num_frames, pad_to)
    mh = _splash_mask.MultiHeadMask([mask for _ in range(num_heads)])
    bq, bkv = min(block_q, pad_to), min(block_kv, pad_to)
    sizes = _splash_kernel.BlockSizes(
        block_q=bq,
        block_kv=bkv,
        block_kv_compute=bkv,
        # backward blocks: required as soon as the kernel is differentiated
        # (the radial custom_vjp routes its backward through splash's vjp);
        # use the fused dkv+dq kernel at the same block shape
        block_q_dkv=bq,
        block_kv_dkv=bkv,
        block_kv_dkv_compute=bkv,
        use_fused_bwd_kernel=True,
    )
    return _splash_kernel.make_splash_mha_single_device(
        mh, block_sizes=sizes, interpret=interpret
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Custom radial flash kernel.
#
# Why splash is not enough here: at the 21-frame headline geometry the radial
# mask keeps 47.6% of token pairs, but splash can only skip work at its
# kv-block granularity, where the band boundaries inflate density to 0.74
# (256 blocks) / ~0.85 (512 blocks) — and its measured per-block throughput
# trails the stock flash kernel (full-mask splash vs flash, RESULTS.jsonl),
# so every swept config LOST to dense flash (77.6 vs 47.5 ms at 31.5k bf16).
#
# This kernel exploits the mask's ANALYTIC structure instead:
#   - a host-side interval schedule lists, per 512-row q block, exactly the
#     256-col kv tiles with any allowed pair (no [T, T] mask ever built:
#     frame/spatial interval arithmetic, ~NQ*NK*pieces^2 integer checks);
#   - the grid walks (batch*head, q block, schedule slot); slots are padded
#     to the densest q block's tile count and the pad slots point their
#     index map at the previous tile, so they re-DMA nothing and skip
#     compute under pl.when;
#   - the in-tile mask is recomputed on the VPU from iota + the radial
#     window formula (integer div/mod + a 10-compare octave ladder) —
#     nothing is streamed from HBM for masking, unlike splash's stored
#     partial-block masks;
#   - softmax runs the standard online-flash accumulators (m/l/acc VMEM
#     scratch, fp32) across a q block's slots.
#
# The backward is splash's: ``sparse_flash_attention`` wraps this forward in
# a custom_vjp whose bwd differentiates the (mathematically identical)
# splash kernel, so sparse layers stay trainable while inference — the
# reference's use of radial attention (inference.py:706-770) — gets the
# fast path.
# ---------------------------------------------------------------------------

# Measured sweep at 31.5k/21f/12h bf16 (vs 46-47 ms dense Pallas flash):
#   256x256: 73.6   512x256: 76.7   256x512: 62.3   512x512: 62.9
#   256x1024: 39.1 <- default      512x1024: 39.7
# The kernel is per-step-cost-bound, not FLOP-bound: small kv tiles buy
# schedule sparsity (density 0.74 at 256 vs 0.99 at 1024) but pay a ~3-5us
# fixed cost per grid step (dynamically-indexed kv DMA + accumulator
# round-trip), so the fat-tile near-dense schedule wins — the 1.2x over
# the stock flash kernel comes from the head-folded step layout (one
# q-block/m/l/acc residency serves all 12 heads) running at ~79% of the
# 31 ms dense-MXU floor, not from skipped blocks.
#
# Failed design, kept as a record: sub-tile compute skipping (fat 1024-col
# DMA spans + a scalar-prefetched bitmask choosing 256x256 sub-dots via
# lax.cond) measured 133 ms — 3.4x WORSE than the same shape without the
# conds (39.7 ms). Mosaic serializes the pipeline around data-dependent
# cond branches, so every skipped FLOP cost more than it saved. Real
# sub-density gains would need hand-rolled multi-buffered DMA + predicated
# MXU issue, not grid-level conds.
_RADIAL_BQ = 256
_RADIAL_BK = 1024


@functools.lru_cache(maxsize=8)
def _radial_schedule(t: int, num_frames: int, bq: int, bk: int):
    """kv-tile schedule + per-slot mask class for the radial kernel.

    Returns ``(sched [NQ, S_MAX] int32, n_steps [NQ] int32,
    full [NQ, S_MAX] int32)``. A tile is scheduled iff some (q row, kv col)
    pair in (q block, kv tile) is allowed by the radial window — computed
    exactly on frame-piece intervals, no dense mask. ``full[i, s] == 1``
    marks tiles where EVERY real pair is allowed AND no kv padding col is
    present: the kernel skips mask work for those entirely (about half the
    scheduled tiles at 31.5k — band interiors and the |Δframe|<=1 strip).
    """
    hw = t // num_frames
    nq = _round_up(t, bq) // bq
    nk = _round_up(t, bk) // bk

    def pieces(lo: int, hi: int):  # inclusive token range -> frame pieces
        lo, hi = min(lo, t - 1), min(hi, t - 1)
        out = []
        f = lo // hw
        while f * hw <= hi:
            s0 = max(lo, f * hw) - f * hw
            s1 = min(hi, f * hw + hw - 1) - f * hw
            out.append((f, s0, s1))
            f += 1
        return out

    def win_of(d: int) -> int:
        return hw if d <= 1 else int(radial_window(np.array(d), hw))

    rows, fulls = [], []
    for i in range(nq):
        qp = pieces(i * bq, (i + 1) * bq - 1)
        q_has_pad = (i + 1) * bq > t
        tiles, tile_full = [], []
        for j in range(nk):
            if j * bk >= t:
                break
            kp = pieces(j * bk, (j + 1) * bk - 1)
            k_has_pad = (j + 1) * bk > t
            hit = False
            all_full = not k_has_pad
            for fq, sq0, sq1 in qp:
                for fk, sk0, sk1 in kp:
                    win = win_of(abs(fq - fk))
                    gap = max(0, sk0 - sq1, sq0 - sk1)
                    span = max(sq1 - sk0, sk1 - sq0)  # max |sq - sk|
                    if gap < win:
                        hit = True
                    if span >= win:
                        all_full = False
            if hit:
                tiles.append(j)
                # padded q rows (clipped out of `pieces`) compute garbage
                # that is sliced off, so they don't disqualify fullness
                tile_full.append(1 if all_full else 0)
        rows.append(tiles)
        fulls.append(tile_full)
    s_max = max(len(r) for r in rows)
    # DMA schedule: pad slots repeat the row's LAST real tile, so the pad
    # slots' index maps re-point at an already-resident block (no DMA);
    # the kernel skips their compute via n_steps.
    sched = np.zeros((nq, s_max), np.int32)
    full = np.zeros((nq, s_max), np.int32)
    n_steps = np.zeros((nq,), np.int32)
    for i, r in enumerate(rows):
        sched[i, : len(r)] = r
        sched[i, len(r):] = r[-1] if r else 0
        full[i, : len(r)] = fulls[i]
        n_steps[i] = len(r)
    return sched, n_steps, full


def _octave_win(d: jax.Array, hw: int) -> jax.Array:
    """radial_window as a compare ladder: hw >> floor(log2(max(d,1))) —
    exact, no float log. Runs on VECTORS ([BQ, 1] row data), never on the
    [BQ, BK] matrix."""
    o = jnp.zeros_like(d)
    p = 2
    while p <= 1 << 12:
        o = o + (d >= p).astype(d.dtype)
        p <<= 1
    return jnp.right_shift(jnp.int32(hw), o)


def _radial_fwd_kernel(
    nh, bq, bk, t, hw, s_max,
    sched_ref, nsteps_ref, q_ref, k_ref, v_ref, o_ref,
    acc_ref, m_ref, l_ref,
):
    """One (q block i, schedule slot s) online-softmax step over ALL heads.

    Two structural choices carry the performance:

    - ALL heads process the slot inside one grid step. The mask/schedule
      is head-shared, so a per-head grid pays the fixed per-step cost
      (scalar-prefetch index maps, DMA descriptor setup, grid sequencing)
      12x and measured 190-230 ms at 31.5k where this layout's ~13k fat
      steps amortize it; the mask is also computed ONCE per slot for all
      heads.
    - The mask costs O(matrix) only where unavoidable: the radial
      arithmetic (frame/spatial decomposition, octave ladder) runs on
      [BQ, 1] vectors, and the per-piece allowed set — one contiguous
      GLOBAL column interval (A_p, B_p) per q row per kv frame piece (a
      tile spans at most bk//hw + 2 frames) — hits the [BQ, BK] matrix as
      two f32 compares + an AND per piece.

    The running max m comes from the RAW scores (an upper bound of the
    masked max): p and l shrink by the same factor, so acc/l stays exact."""
    f32 = jnp.float32
    i = pl.program_id(1)
    s = pl.program_id(2)
    j = sched_ref[i, s]

    @pl.when(s == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(s < nsteps_ref[i])
    def _step():
        # shared bounds mask (computed once per slot, reused by all heads)
        qi = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
        fq = qi // hw
        sq = qi - fq * hw
        c0 = j * bk  # first global kv col of the tile
        fk0 = c0 // hw
        cmat = (c0 + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)).astype(f32)

        def piece(fp):
            # piece's global col range [p0, p1) (empty if p0 >= p1)
            p0 = jnp.maximum(fp * hw, c0)
            p1 = jnp.minimum(jnp.minimum((fp + 1) * hw, t), c0 + bk)
            win = _octave_win(jnp.abs(fq - fp), hw)  # [BQ, 1]
            center = fp * hw + sq
            a = jnp.maximum(center - win, p0 - 1).astype(f32)
            b = jnp.minimum(center + win, p1).astype(f32)
            return (cmat > a) & (cmat < b)  # 2 cmp + 1 and, [BQ, BK]

        am = piece(fk0)
        for pi in range(1, bk // hw + 2):
            am |= piece(fk0 + pi)
        amask = am.astype(f32)

        # ALL-head batched update: rank-3 dots (batch dim = head) and ONE
        # read-modify-write of each scratch per step. Per-head slice RMWs
        # serialize under Mosaic's memory ordering (measured 70 ms; this
        # form lets the 12 head dots pipeline).
        q = q_ref[0]  # [H, BQ, D] (scale pre-folded)
        k = k_ref[0]  # [H, BK, D]
        v = v_ref[0]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )  # [H, BQ, BK]
        m_prev = m_ref[:, :, :1]  # [H, BQ, 1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new) * amask[None]
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, -1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )

    @pl.when(s == s_max - 1)
    def _fin():
        l = l_ref[:, :, :1]
        o_ref[0] = (acc_ref[...] / jnp.where(l == 0, 1.0, l)).astype(
            o_ref.dtype
        )


def radial_flash_attention(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,
    v: jax.Array,
    num_frames: int,
    scale: Optional[float] = None,
    compute_dtype: Optional[jnp.dtype] = None,
    interpret: bool = False,
) -> jax.Array:
    """Forward radial attention via the analytic-mask Pallas kernel."""
    b, t, h, d = q.shape
    scale = d**-0.5 if scale is None else scale
    hw = t // num_frames
    assert hw * num_frames == t, (t, num_frames)
    cdt = compute_dtype or (
        jnp.bfloat16 if q.dtype == jnp.float32 else q.dtype
    )
    bq, bk = _RADIAL_BQ, _RADIAL_BK
    tq, tk = _round_up(t, bq), _round_up(t, bk)
    sched_np, nsteps_np, _ = _radial_schedule(t, num_frames, bq, bk)
    with jax.ensure_compile_time_eval():
        sched = jnp.asarray(sched_np)
        nsteps = jnp.asarray(nsteps_np)
    nq, s_max = sched_np.shape

    def fold(x, tp):
        x = x.astype(cdt).swapaxes(1, 2)  # [B, H, T, D]
        return jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0)))

    qs = fold(q * scale, tq)
    ks = fold(k, tk)
    vs = fold(v, tk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nq, s_max),
        in_specs=[
            pl.BlockSpec(
                (1, h, bq, d), lambda bi, i, s, sr, nr: (bi, 0, i, 0)
            ),
            pl.BlockSpec(
                (1, h, bk, d), lambda bi, i, s, sr, nr: (bi, 0, sr[i, s], 0)
            ),
            pl.BlockSpec(
                (1, h, bk, d), lambda bi, i, s, sr, nr: (bi, 0, sr[i, s], 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, bq, d), lambda bi, i, s, sr, nr: (bi, 0, i, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((h, bq, d), jnp.float32),
            pltpu.VMEM((h, bq, 128), jnp.float32),
            pltpu.VMEM((h, bq, 128), jnp.float32),
        ],
    )
    n_sched = int(nsteps_np.sum())
    out = pl.pallas_call(
        functools.partial(_radial_fwd_kernel, h, bq, bk, t, hw, s_max),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, tq, d), cdt),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n_sched * 2 * bq * bk * d,
            bytes_accessed=(qs.size + 2 * h * n_sched * bk * d + qs.size)
            * qs.dtype.itemsize,
            transcendentals=b * h * n_sched * bq * bk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(sched, nsteps, qs, ks, vs)
    out = out[:, :, :t].swapaxes(1, 2)
    return out.astype(q.dtype)


def _splash_attention(q, k, v, num_frames, scale, cdt, interpret=False):
    """The splash-kernel path (differentiable; the radial custom kernel's
    backward rides splash's vjp)."""
    b, t, h, d = q.shape
    tp = _round_up(t, max(BLOCK_Q, BLOCK_KV))
    # build OUTSIDE any active trace: the kernel object carries mask-info
    # arrays, and materializing those under jit would cache leaked tracers
    with jax.ensure_compile_time_eval():
        kernel = _build_splash_kernel(t, num_frames, h, d, tp, interpret)
    qs = (q * scale).astype(cdt).swapaxes(1, 2)  # [B, H, T, D]
    ks = k.astype(cdt).swapaxes(1, 2)
    vs = v.astype(cdt).swapaxes(1, 2)
    if tp != t:
        pad = ((0, 0), (0, 0), (0, tp - t), (0, 0))
        qs, ks, vs = jnp.pad(qs, pad), jnp.pad(ks, pad), jnp.pad(vs, pad)
    out = jax.vmap(kernel)(qs, ks, vs)  # [B, H, Tp, D]
    return out[:, :, :t].swapaxes(1, 2).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _radial_sparse(q, k, v, num_frames, scale, cdt):
    return radial_flash_attention(
        q, k, v, num_frames, scale=scale, compute_dtype=cdt
    )


def _radial_sparse_fwd(q, k, v, num_frames, scale, cdt):
    return _radial_sparse(q, k, v, num_frames, scale, cdt), (q, k, v)


def _radial_sparse_bwd(num_frames, scale, cdt, res, do):
    # splash computes the SAME masked softmax attention, so its vjp is this
    # function's vjp; the custom forward kernel stays forward-only (the
    # reference uses radial attention for inference; training still works,
    # at splash's fwd+bwd cost)
    q, k, v = res
    _, vjp = jax.vjp(
        lambda a, b_, c: _splash_attention(a, b_, c, num_frames, scale, cdt),
        q, k, v,
    )
    return vjp(do)


_radial_sparse.defvjp(_radial_sparse_fwd, _radial_sparse_bwd)


def sparse_flash_attention(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,
    v: jax.Array,
    num_frames: int,
    scale: Optional[float] = None,
    compute_dtype: Optional[jnp.dtype] = None,
    impl: Optional[str] = None,  # None (auto) | "radial" | "splash"
) -> jax.Array:
    """Radial block-sparse attention. Non-causal bidirectional video
    attention over frame-major tokens.

    On TPU the forward runs the analytic-mask radial Pallas kernel (see the
    block comment above ``_radial_schedule``); gradients ride the splash
    kernel's vjp. On CPU: masked SDPA (tests flip ``FORCE_INTERPRET`` to
    exercise the splash kernel in interpret mode instead).

    ``compute_dtype`` sets the kernels' stream dtype; the default (None)
    casts fp32 inputs to bf16: the Pallas dots run at the INPUT dtype's
    true precision (unlike XLA's default one-bf16-pass f32 matmuls), so
    fp32 streams pay the ~4x fp32 MXU rate. The reference's sparse path is
    half-precision flash-attn/BSA CUDA kernels (model.py:258-281), so bf16
    streams are reference-faithful; softmax statistics accumulate fp32
    regardless. Pass ``jnp.float32`` for full-precision kernel runs.
    """
    b, t, h, d = q.shape
    scale = d**-0.5 if scale is None else scale
    interpret = FORCE_INTERPRET and jax.default_backend() != "tpu"
    cdt = compute_dtype or (
        jnp.bfloat16 if q.dtype == jnp.float32 else q.dtype
    )
    if jax.default_backend() != "tpu" and not interpret:
        mask = jnp.asarray(radial_mask_dense(t, num_frames))
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        logits = jnp.where(mask[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    if interpret or impl == "splash":
        return _splash_attention(
            q, k, v, num_frames, scale, cdt, interpret=interpret
        )
    # radial kernel needs tokens to tile exactly into frames
    if t % num_frames != 0 and impl != "radial":
        return _splash_attention(q, k, v, num_frames, scale, cdt)
    return _radial_sparse(q, k, v, num_frames, scale, cdt)

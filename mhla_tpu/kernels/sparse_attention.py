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


@functools.lru_cache(maxsize=8)
def _build_splash_kernel(
    seq_len: int,
    num_frames: int,
    num_heads: int,
    head_dim: int,
    pad_to: int,
    interpret: bool,
):
    mask = RadialMask(seq_len, num_frames, pad_to)
    mh = _splash_mask.MultiHeadMask([mask for _ in range(num_heads)])
    return _splash_kernel.make_splash_mha_single_device(mh, interpret=interpret)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def sparse_flash_attention(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,
    v: jax.Array,
    num_frames: int,
    scale: Optional[float] = None,
) -> jax.Array:
    """Radial block-sparse attention (splash kernel on TPU, masked SDPA on
    CPU). Non-causal bidirectional video attention over frame-major tokens.
    """
    b, t, h, d = q.shape
    scale = d**-0.5 if scale is None else scale
    interpret = FORCE_INTERPRET and jax.default_backend() != "tpu"
    if jax.default_backend() != "tpu" and not interpret:
        mask = jnp.asarray(radial_mask_dense(t, num_frames))
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        logits = jnp.where(mask[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    tp = _round_up(t, 128)
    # build OUTSIDE any active trace: the kernel object carries mask-info
    # arrays, and materializing those under jit would cache leaked tracers
    with jax.ensure_compile_time_eval():
        kernel = _build_splash_kernel(t, num_frames, h, d, tp, interpret)
    qs = (q * scale).swapaxes(1, 2)  # [B, H, T, D]
    ks = k.swapaxes(1, 2)
    vs = v.swapaxes(1, 2)
    if tp != t:
        pad = ((0, 0), (0, 0), (0, tp - t), (0, 0))
        qs, ks, vs = jnp.pad(qs, pad), jnp.pad(ks, pad), jnp.pad(vs, pad)
    out = jax.vmap(kernel)(qs, ks, vs)  # [B, H, Tp, D]
    return out[:, :, :t].swapaxes(1, 2)

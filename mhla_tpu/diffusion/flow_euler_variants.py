"""Frame-conditioned FlowEuler variants (LTX-style + staggered chunks).

TPU-native re-designs of the reference's diffusers-backed samplers
(``mhla_videogen/diffusion/scheduler/flow_euler_sampler.py``):

- :func:`ltx_flow_euler_sample_loop` — ``LTXFlowEuler`` (:87-194):
  per-FRAME timesteps with hard-conditioning frames (i2v/continuation).
  Conditioning frames are pinned to t=0 (clean) and optionally re-noised
  each step with ``noise_scale * z * t^2`` for motion continuity; all other
  frames take plain Euler flow steps.
- :func:`chunk_flow_euler_sample_loop` — ``ChunkFlowEuler`` (:197-399):
  temporal chunks start denoising staggered by ``interval_k * steps``
  steps; once a chunk has started it stays in the model input (finished
  chunks ride along at t=0, exactly like the reference's timestep matrix
  whose finished entries are 0, :283-285).

Conventions differ from the torch reference deliberately:
- time runs in [0, 1] (t=1 noise), matching
  :func:`mhla_tpu.diffusion.gaussian_diffusion.flow_euler_sample_loop`;
  the reference's diffusers scheduler uses sigma in [0, 1000] and a negated
  velocity — the Euler update ``x <- x + (t_next - t_cur) v`` is the same
  integral.
- the model signature is ``model(x, t_frames, **kwargs)`` with ``t_frames``
  of shape [B, F] (per-frame timesteps). The reference passes
  ``timestep[:, :1, :, 0, 0]`` = [B, 1, F]; [B, F] is the same information
  without the singleton.
- each stage of the chunked sampler is one ``lax.scan`` (one XLA program
  per distinct active-frame count), not a per-step host loop.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _shift_ts(num_steps: int, shift: float) -> np.ndarray:
    ts = np.linspace(1.0, 0.0, num_steps + 1)
    if shift != 1.0:
        ts = shift * ts / (1 + (shift - 1) * ts)
    return ts


def ltx_flow_euler_sample_loop(
    model: Callable,
    latents: jax.Array,  # [B, C, F, H, W] init latents (noise; cond frames clean)
    rng: jax.Array,
    num_steps: int = 28,
    condition_mask: Optional[jax.Array] = None,  # [.., F, ..] 1=conditioning
    noise_scale: float = 0.0,
    model_kwargs: Optional[dict] = None,
    shift: float = 3.0,
) -> jax.Array:
    """LTX-style frame-conditioned FlowEuler (reference :117-194).

    ``condition_mask`` broadcasts against ``latents`` and marks hard-
    conditioning frames (1.0). Those frames keep their input latents; with
    ``noise_scale > 0`` they are re-noised each step by
    ``init + noise_scale * z * t^2`` (reference :91-115) so the model sees
    temporally-consistent noise statistics.
    """
    model_kwargs = model_kwargs or {}
    b, _, f = latents.shape[:3]
    if condition_mask is None:
        condition_mask = jnp.zeros_like(latents)
    mask = jnp.broadcast_to(condition_mask, latents.shape).astype(jnp.float32)
    # per-frame conditioning indicator [B, F] (a frame counts as conditioning
    # if any channel is masked — the reference masks whole frames)
    frame_mask = jnp.max(mask, axis=(1, 3, 4))
    ts = jnp.asarray(_shift_ts(num_steps, shift), jnp.float32)
    init = latents.astype(jnp.float32)

    def body(carry, i):
        x, step_rng = carry
        t_cur, t_next = ts[i], ts[i + 1]
        if noise_scale > 0.0:
            step_rng, sub = jax.random.split(step_rng)
            z = jax.random.normal(sub, x.shape, jnp.float32)
            renoised = init + noise_scale * z * t_cur**2
            x = jnp.where(mask > 0.5, renoised, x)
        # conditioning frames enter the model at t=0 (reference :155)
        t_frames = jnp.minimum(
            jnp.full((b, f), t_cur, jnp.float32), 1.0 - frame_mask
        )
        v = model(x, t_frames, **model_kwargs).astype(jnp.float32)
        stepped = x + (t_next - t_cur) * v
        # only tokens still being denoised move (reference :188-189)
        x = jnp.where(mask > 0.5, x, stepped)
        return (x, step_rng), None

    (x, _), _ = jax.lax.scan(
        body, (init, rng), jnp.arange(num_steps)
    )
    return x


def create_temporal_chunks(
    num_frames: int, chunk_index: Optional[Sequence[int]]
) -> List[Tuple[int, int]]:
    """Chunk (start, end) spans from sorted start indices (reference
    :201-225)."""
    if not chunk_index:
        return [(0, num_frames)]
    idx = sorted(chunk_index)
    spans = [(idx[i], idx[i + 1]) for i in range(len(idx) - 1)]
    spans.append((idx[-1], num_frames))
    return spans


def chunk_flow_euler_sample_loop(
    model: Callable,
    latents: jax.Array,  # [B, C, F, H, W]
    rng: jax.Array,
    num_steps: int = 50,
    chunk_index: Optional[Sequence[int]] = None,
    interval_k: float = 0.5,
    model_kwargs: Optional[dict] = None,
    shift: float = 3.0,
    pass_chunk_starts: bool = False,
) -> jax.Array:
    """Staggered temporal-chunk FlowEuler (reference :227-399).

    Chunk c starts denoising at global step ``int(c * interval_k *
    num_steps)``. The model only ever sees frames of chunks that have
    STARTED (later chunks are absent, finished chunks ride along at t=0) —
    so the sampler runs in ``num_chunks`` stages, one compiled
    ``lax.scan`` per active-frame count. With ``pass_chunk_starts`` the
    model receives ``chunk_starts`` (tuple of active-chunk start frames,
    reference :350) for position-offset handling.
    """
    model_kwargs = dict(model_kwargs or {})
    b, c_ch, f = latents.shape[:3]
    chunks = create_temporal_chunks(f, list(chunk_index or [0]))
    n_chunks = len(chunks)
    starts = [int(i * interval_k * num_steps) for i in range(n_chunks)]
    total = (starts[-1] + num_steps) if n_chunks > 1 else num_steps
    ts = _shift_ts(num_steps, shift)  # descending, len num_steps+1

    x = latents.astype(jnp.float32)

    # stage s covers global steps [starts[s], starts[s+1]) with chunks
    # 0..s active; the final stage runs to ``total``.
    for stage in range(n_chunks):
        g_lo = starts[stage]
        g_hi = starts[stage + 1] if stage + 1 < n_chunks else total
        if g_hi <= g_lo:
            continue
        lo_f = chunks[0][0]
        hi_f = chunks[stage][1]
        active = x[:, :, lo_f:hi_f]
        n_active_f = hi_f - lo_f
        if pass_chunk_starts:
            model_kwargs["chunk_starts"] = tuple(
                chunks[i][0] for i in range(stage + 1)
            )

        # per-chunk timestep index at global step g: g - starts[c], clipped
        # to [0, num_steps] (before-start never happens inside this stage;
        # after-end means finished -> t=0 since ts[num_steps] = 0)
        starts_v = jnp.asarray(starts[: stage + 1], jnp.int32)
        frame_chunk = np.concatenate(
            [
                np.full(chunks[i][1] - chunks[i][0], i, np.int32)
                for i in range(stage + 1)
            ]
        )
        frame_chunk_j = jnp.asarray(frame_chunk)
        ts_j = jnp.asarray(ts, jnp.float32)

        def body(carry, g, starts_v=starts_v, frame_chunk_j=frame_chunk_j,
                 ts_j=ts_j, n_active_f=n_active_f):
            act, _ = carry
            step_idx = jnp.clip(g - starts_v, 0, num_steps)  # [n_act_chunks]
            t_cur_c = ts_j[step_idx]  # per-chunk current t
            t_next_c = ts_j[jnp.clip(step_idx + 1, 0, num_steps)]
            # finished chunks: dt = 0 (t stays 0)
            dt_c = jnp.where(step_idx >= num_steps, 0.0, t_next_c - t_cur_c)
            t_frames = t_cur_c[frame_chunk_j][None, :].repeat(b, 0)
            dt_frames = dt_c[frame_chunk_j][None, :, None, None]  # [1,F,1,1]
            v = model(act, t_frames, **model_kwargs).astype(jnp.float32)
            act = act + dt_frames[:, None] * v  # broadcast over channel dim
            return (act, 0), None

        (active, _), _ = jax.lax.scan(
            body, (active, 0), jnp.arange(g_lo, g_hi)
        )
        x = x.at[:, :, lo_f:hi_f].set(active)

    return x

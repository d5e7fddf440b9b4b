"""LM losses: fused linear + cross-entropy without logit materialization.

TPU equivalent of the reference's fused Triton losses
(``fla/modules/fused_cross_entropy.py`` and
``fused_linear_cross_entropy.py`` — the ``fuse_linear_cross_entropy`` option
of the LM, a large memory win at 32k vocab): the [B*T, V] logits are never
materialized in HBM. Token chunks are processed under ``jax.checkpoint`` so
the backward pass recomputes each chunk's logits instead of storing them —
peak memory drops from O(T * V) to O(chunk * V).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jax.Array, labels: jax.Array, ignore_index: int = -100,
    label_smoothing: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Per-token CE over the last axis; returns (nll [.., T], mask)."""
    logits = logits.astype(jnp.float32)
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    nll = logz - gold
    if label_smoothing > 0:
        nll = (1 - label_smoothing) * nll + label_smoothing * (
            logz - logits.mean(axis=-1)
        )
    return nll * mask, mask


@partial(
    jax.jit, static_argnames=("chunk_size", "ignore_index", "label_smoothing")
)
def fused_linear_cross_entropy(
    hidden: jax.Array,  # [B, T, H] final hidden states
    weight: jax.Array,  # [V, H] unembedding matrix (tied embedding)
    labels: jax.Array,  # [B, T] int labels (already shifted)
    bias: Optional[jax.Array] = None,
    chunk_size: int = 4096,
    ignore_index: int = -100,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Mean CE of ``hidden @ weight.T`` vs labels, logits never stored."""
    b, t, h = hidden.shape
    x = hidden.reshape(b * t, h)
    y = labels.reshape(b * t)
    n = b * t
    pad = (-n) % chunk_size
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        y = jnp.pad(y, ((0, pad),), constant_values=ignore_index)
    n_chunks = x.shape[0] // chunk_size
    x = x.reshape(n_chunks, chunk_size, h)
    y = y.reshape(n_chunks, chunk_size)

    @jax.checkpoint
    def chunk_loss(x_c, y_c):
        logits = x_c.astype(jnp.float32) @ weight.T.astype(jnp.float32)
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        nll, mask = cross_entropy(logits, y_c, ignore_index, label_smoothing)
        return nll.sum(), mask.sum()

    def body(carry, xs):
        total, count = carry
        s, c = chunk_loss(*xs)
        return (total + s, count + c), None

    (total, count), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)), (x, y)
    )
    return total / jnp.maximum(count, 1)


@partial(jax.jit, static_argnames=("reduction", "chunk_size"))
def fused_kl_div_loss(
    x: jax.Array,  # [N, H] student hidden states
    target_x: jax.Array,  # [N, H] teacher hidden states
    weight: jax.Array,  # [V, H] student unembedding
    target_weight: jax.Array,  # [V, H] teacher unembedding
    reduction: str = "batchmean",
    chunk_size: int = 4096,
) -> jax.Array:
    """KL(teacher || student) over the vocab, logits never materialized.

    TPU port of the reference's fused KL-div distillation loss
    (``mhla_nlp/fla/modules/fused_kl_div.py:119-186`` chunked forward,
    ``:253-279`` public API): both students' and teachers' logits are
    produced per token-chunk and reduced immediately; ``jax.checkpoint``
    recomputes them in the backward instead of storing [N, V].
    ``batchmean`` divides by the token count N (the reference's only
    supported reduction).
    """
    if reduction not in ("batchmean", "sum"):
        raise ValueError(f"unsupported reduction: {reduction}")
    n, h = x.shape
    pad = (-n) % chunk_size
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        target_x = jnp.pad(target_x, ((0, pad), (0, 0)))
    n_chunks = x.shape[0] // chunk_size
    xc = x.reshape(n_chunks, chunk_size, h)
    txc = target_x.reshape(n_chunks, chunk_size, h)
    # padded rows have identical (all-zero) student/teacher logits -> KL 0
    @jax.checkpoint
    def chunk_kl(x_c, tx_c):
        sl = x_c.astype(jnp.float32) @ weight.T.astype(jnp.float32)
        tl_ = tx_c.astype(jnp.float32) @ target_weight.T.astype(jnp.float32)
        sp_log = jax.nn.log_softmax(sl, axis=-1)
        tp_log = jax.nn.log_softmax(tl_, axis=-1)
        tp = jnp.exp(tp_log)
        return jnp.sum(tp * (tp_log - sp_log))

    def body(total, xs):
        return total + chunk_kl(*xs), None

    total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (xc, txc))
    return total / n if reduction == "batchmean" else total


def grpo_loss(
    logits: jax.Array,  # [B, T, V] policy logits
    ref_logp: jax.Array,  # [B, T-1] reference-policy per-token log-probs
    input_ids: jax.Array,  # [B, T] completion ids (last T cols of the row)
    advantages: jax.Array,  # [B] group-relative advantages
    beta: float = 0.1,
    completion_mask: Optional[jax.Array] = None,  # [B, T-1] 1=real token
    save_kl: bool = False,
):
    """Per-token GRPO loss (policy-gradient + beta * KL-to-reference).

    Mirrors the reference's ``grpo_loss_torch``
    (``mhla_nlp/fla/modules/grpo.py:328-349``, the oracle its fused Triton
    kernel is tested against): ``kl = exp(ref - logp) - (ref - logp) - 1``
    (the k3 estimator) and the REINFORCE term
    ``exp(logp - stop_grad(logp)) * advantage`` whose value is the advantage
    but whose gradient is ``advantage * d logp``. Returns [B, T-1] per-token
    losses (callers reduce), or ``(loss, kl)`` with ``save_kl``.
    """
    logits = logits[:, :-1].astype(jnp.float32)
    ids = input_ids[:, -logits.shape[1] :]
    logp_all = jax.nn.log_softmax(logits, axis=-1)
    logp = jnp.take_along_axis(logp_all, ids[..., None], axis=-1)[..., 0]
    ref = ref_logp.astype(jnp.float32)
    kl = jnp.exp(ref - logp) - (ref - logp) - 1.0
    ratio = jnp.exp(logp - jax.lax.stop_gradient(logp))
    loss = -(ratio * advantages[:, None] - beta * kl)
    if completion_mask is not None:
        loss = loss * completion_mask
        if save_kl:
            kl = kl * completion_mask
    return (loss, kl) if save_kl else loss


def l2_warp(loss: jax.Array, logits: jax.Array, weight: float = 1e-4) -> jax.Array:
    """L2Wrap logit penalty via gradient hack (``fla/modules/l2warp.py``):
    adds a pull-to-zero gradient on each position's max logit without
    changing the loss value. The reference backward writes
    ``(weight / (B*T)) * max`` at the argmax; ``d/dmax[w/2 * mean(max^2)]``
    reproduces exactly that (the 1/2 cancels the square's 2)."""
    penalty = 0.5 * weight * jnp.mean(
        jnp.max(logits.astype(jnp.float32), axis=-1) ** 2
    )
    return loss + penalty - jax.lax.stop_gradient(penalty)

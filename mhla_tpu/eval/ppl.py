"""Block-wise long-context perplexity evaluation.

Re-implements the reference evaluator (``mhla_nlp/evals/ppl.py:16-232``):
stream tokens into fixed-size blocks (reference default 28,672 = 14 * 2048),
compute token-level NLL over each block in one forward, and report both the
total perplexity and a per-bucket breakdown (reference buckets of 2048) to
expose long-context degradation.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def token_nll(model, params, ids: jax.Array) -> jax.Array:
    """Per-token shifted NLL, [B, T-1] fp32."""
    logits, _ = model.apply(params, ids)
    logits = logits[:, :-1].astype(jnp.float32)
    labels = ids[:, 1:]
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return logz - gold


class PerplexityEvaluator:
    def __init__(
        self,
        model,
        params,
        block_size: int = 28672,
        bucket_size: int = 2048,
    ):
        self.model = model
        self.params = params
        self.block_size = block_size
        self.bucket_size = bucket_size
        self._nll = jax.jit(lambda ids: token_nll(model, params, ids))

    def evaluate_tokens(self, tokens: np.ndarray) -> Dict[str, float]:
        """tokens: 1-D int array; evaluated in contiguous blocks."""
        n_blocks = len(tokens) // self.block_size
        assert n_blocks > 0, "need at least one full block"
        total_nll, total_count = 0.0, 0
        buckets: Dict[int, List[float]] = {}
        for b in range(n_blocks):
            ids = jnp.asarray(
                tokens[b * self.block_size : (b + 1) * self.block_size],
                jnp.int32,
            )[None, :]
            nll = np.asarray(self._nll(ids))[0]  # [block-1]
            total_nll += float(nll.sum())
            total_count += nll.size
            for start in range(0, nll.size, self.bucket_size):
                idx = start // self.bucket_size
                buckets.setdefault(idx, []).append(
                    float(nll[start : start + self.bucket_size].mean())
                )
        out = {"ppl": float(np.exp(total_nll / total_count))}
        for idx, vals in sorted(buckets.items()):
            pos = (idx + 1) * self.bucket_size
            out[f"ppl@{pos}"] = float(np.exp(np.mean(vals)))
        return out

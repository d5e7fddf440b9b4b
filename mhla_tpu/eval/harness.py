"""lm-evaluation-harness bridge (reference ``mhla_nlp/evals/harness.py``).

Registers the MHLA LM as an lm-eval model so standard benchmark suites run
against it. lm-eval is optional (not in the baked image) — the adapter is
import-guarded; without it, :class:`SimpleLMEval` provides loglikelihood
scoring with the same interface shape for local evaluation.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SimpleLMEval:
    """Minimal loglikelihood API over the MHLA LM (no tokenizer assumed:
    callers pass token ids)."""

    def __init__(self, model, params, max_len: int = 2048):
        self.model = model
        self.params = params
        self.max_len = max_len
        self._nll = jax.jit(self._nll_fn)

    def _nll_fn(self, ids):
        logits, _ = self.model.apply(self.params, ids)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        gold = jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]
        greedy = jnp.argmax(logits[:, :-1], -1) == ids[:, 1:]
        return gold, greedy

    def loglikelihood(
        self, context_ids: List[List[int]], continuation_ids: List[List[int]]
    ) -> List[Tuple[float, bool]]:
        """Per (context, continuation): (sum logprob, is_greedy)."""
        out = []
        for ctx, cont in zip(context_ids, continuation_ids):
            ids = (ctx + cont)[-self.max_len :]
            arr = jnp.asarray(ids, jnp.int32)[None]
            gold, greedy = self._nll(arr)
            n_cont = len(cont)
            out.append(
                (
                    float(gold[0, -n_cont:].sum()),
                    bool(np.asarray(greedy[0, -n_cont:]).all()),
                )
            )
        return out


try:  # pragma: no cover - lm_eval not in the base image
    from lm_eval.api.model import LM  # type: ignore
    from lm_eval.api.registry import register_model  # type: ignore

    @register_model("mhla_tpu")
    class MHLATPULMWrapper(LM):
        """lm-eval model wrapper: construct with model/params/tokenizer."""

        def __init__(self, model, params, tokenizer, max_len: int = 2048):
            super().__init__()
            self.inner = SimpleLMEval(model, params, max_len)
            self.tokenizer = tokenizer

        def loglikelihood(self, requests):
            ctxs, conts = [], []
            for req in requests:
                ctx, cont = req.args
                ctxs.append(self.tokenizer.encode(ctx))
                conts.append(self.tokenizer.encode(cont))
            return self.inner.loglikelihood(ctxs, conts)

        def loglikelihood_rolling(self, requests):
            raise NotImplementedError

        def generate_until(self, requests):
            raise NotImplementedError

except ImportError:  # lm_eval unavailable: SimpleLMEval still works
    pass

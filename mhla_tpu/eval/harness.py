"""lm-evaluation-harness bridge (reference ``mhla_nlp/evals/harness.py``).

Registers the MHLA LM as an lm-eval model so standard benchmark suites run
against it. lm-eval is optional (not in the baked image) — the adapter is
import-guarded; without it, :class:`SimpleLMEval` provides loglikelihood /
rolling-loglikelihood / generation with the same interface shape for local
evaluation.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SimpleLMEval:
    """Minimal lm-eval-shaped API over the MHLA LM (no tokenizer assumed:
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

    def loglikelihood_rolling(self, token_ids: List[List[int]]) -> List[float]:
        """Full-sequence loglikelihood, windowed at max_len with a
        max_len//2-token overlap carried as context (the standard rolling
        scheme lm-eval expects: every token scored exactly once)."""
        stride = self.max_len // 2
        out = []
        for ids in token_ids:
            total, scored = 0.0, 0
            pos = 0
            while scored < len(ids) - 1:
                window = ids[pos : pos + self.max_len]
                arr = jnp.asarray(window, jnp.int32)[None]
                gold, _ = self._nll(arr)
                # first window scores all its targets; later windows only
                # the tokens past the overlap
                new = len(window) - 1 if pos == 0 else len(window) - 1 - (
                    scored - pos
                )
                total += float(gold[0, -new:].sum())
                scored = pos + len(window) - 1
                if pos + self.max_len >= len(ids):
                    break
                pos += stride
            out.append(total)
        return out

    def generate(
        self,
        context_ids: List[List[int]],
        max_new_tokens: int = 64,
        until_ids: Optional[List[int]] = None,
        temperature: float = 0.0,
    ) -> List[List[int]]:
        """Greedy/sampled continuation per context; stops at any token in
        ``until_ids`` (kept out of the returned continuation)."""
        from ..models.generation import generate as gen

        outs = []
        for ctx in context_ids:
            ids = jnp.asarray(ctx[-self.max_len :], jnp.int32)[None]
            full = gen(
                self.model,
                self.params,
                ids,
                max_new_tokens=max_new_tokens,
                temperature=temperature,
            )
            cont = list(np.asarray(full[0, ids.shape[1] :]))
            if until_ids:
                for stop in until_ids:
                    if stop in cont:
                        cont = cont[: cont.index(stop)]
            outs.append([int(t) for t in cont])
        return outs


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
            toks = [self.tokenizer.encode(req.args[0]) for req in requests]
            return self.inner.loglikelihood_rolling(toks)

        def generate_until(self, requests):
            outs = []
            for req in requests:
                ctx, gen_kwargs = req.args
                until = gen_kwargs.get("until", [])
                if isinstance(until, str):
                    until = [until]
                max_new = gen_kwargs.get("max_gen_toks", 64)
                ids = self.tokenizer.encode(ctx)
                cont = self.inner.generate(
                    [ids],
                    max_new_tokens=max_new,
                    temperature=gen_kwargs.get("temperature", 0.0),
                )[0]
                text = self.tokenizer.decode(cont)
                for stop in until:  # string-level stop sequences
                    if stop and stop in text:
                        text = text[: text.index(stop)]
                outs.append(text)
            return outs

except ImportError:  # lm_eval unavailable: SimpleLMEval still works
    pass

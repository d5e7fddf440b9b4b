"""Long-context perplexity CLI.

The reference's ``python evals/ppl.py -p <model> -d fla-hub/pg19`` equivalent:
loads an LM from a train checkpoint (or reference model json), streams
tokens from a pre-tokenized .npy/.bin shard or a HF dataset, and prints a
JSON report with total PPL plus the per-2048-bucket breakdown that exposes
long-context degradation.

Usage:
    python -m mhla_tpu.eval.ppl_cli --ckpt=work_dirs/lm/step_1000 \
        --tokens=shard.npy --block_size=28672
"""

from __future__ import annotations

import dataclasses
import json
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gla_lm import MHLAForCausalLM, MHLALMConfig
from ..utils.config import parse_cli
from .ppl import PerplexityEvaluator


@dataclasses.dataclass
class PPLConfig:
    ckpt: Optional[str] = None  # orbax checkpoint; None -> random init
    model_json: Optional[str] = None  # reference-format model config json
    tokens: Optional[str] = None  # pre-tokenized .npy/.bin int shard
    dataset: Optional[str] = None  # HF dataset name (streamed + tokenized)
    tokenizer: str = "gpt2"
    text_key: str = "text"
    max_tokens: int = 1 << 20
    block_size: int = 28672
    bucket_size: int = 2048
    bf16: bool = True
    out: Optional[str] = None  # write the JSON report here too
    # tiny-model overrides (smoke)
    vocab_size: Optional[int] = None
    hidden_size: Optional[int] = None
    num_hidden_layers: Optional[int] = None
    num_heads: Optional[int] = None


def _load_tokens(cfg: PPLConfig) -> np.ndarray:
    if cfg.tokens:
        if cfg.tokens.endswith(".npy"):
            return np.load(cfg.tokens).astype(np.int32).reshape(-1)
        return np.fromfile(cfg.tokens, dtype=np.uint16).astype(np.int32)
    if cfg.dataset:
        from datasets import load_dataset
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(cfg.tokenizer)
        ds = load_dataset(cfg.dataset, split="test", streaming=True)
        out = []
        for row in ds:
            out.extend(tok(row[cfg.text_key]).input_ids)
            if len(out) >= cfg.max_tokens:
                break
        return np.asarray(out[: cfg.max_tokens], np.int32)
    raise ValueError("provide --tokens=<shard> or --dataset=<name>")


def main(argv=None) -> dict:
    cfg = parse_cli(PPLConfig, argv if argv is not None else sys.argv[1:])

    if cfg.model_json:
        model_cfg = MHLALMConfig.from_json(cfg.model_json)
    else:
        model_cfg = MHLALMConfig()
    for k in ("vocab_size", "hidden_size", "num_hidden_layers", "num_heads"):
        v = getattr(cfg, k)
        if v is not None:
            model_cfg = dataclasses.replace(model_cfg, **{k: v})
    if cfg.bf16:
        model_cfg = dataclasses.replace(model_cfg, dtype=jnp.bfloat16)

    model = MHLAForCausalLM(model_cfg)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
    )
    if cfg.ckpt:
        from ..utils.checkpoint import load_params_from_checkpoint

        params = load_params_from_checkpoint(cfg.ckpt, template)
    else:
        params = template

    tokens = _load_tokens(cfg)
    n_blocks = len(tokens) // cfg.block_size
    if n_blocks == 0:
        raise ValueError(
            f"{len(tokens)} tokens < one block ({cfg.block_size}); lower "
            "--block_size"
        )

    evaluator = PerplexityEvaluator(
        model, params, block_size=cfg.block_size, bucket_size=cfg.bucket_size
    )
    report = evaluator.evaluate_tokens(tokens)
    print(json.dumps(report))
    if cfg.out:
        with open(cfg.out, "w") as fh:
            json.dump(report, fh, indent=2)
    return report


if __name__ == "__main__":
    main()

"""Chat-templated prompt embedding (the reference's optional Qwen path).

The reference ships ``QwenVLEmbedder``
(``mhla_videogen/diffusion/model/qwen/qwen_vl.py:9-211``) — an optional
prompt-conditioning encoder (commented out in ``inference.py``) that runs
prompts through Qwen2.5-VL inside a fixed chat template and keeps only the
hidden states of the user text (skipping a known number of template prefix
tokens, masking padding).

TPU stance: this is frozen host-side conditioning, like the umT5/CLIP
encoders — but the reference treats it as a swappable external LLM, so
here it is a thin generic adapter over ANY HuggingFace causal LM rather
than a re-implementation: the framework-owned logic is the template
mechanics (left padding, prefix skipping, per-prompt masked extraction),
which is what the tests pin. Degrades cleanly when transformers/weights
are absent.
"""

from __future__ import annotations

from typing import Any, List, Optional

import numpy as np

# chat template with the same shape as the reference's
# ``prompt_template_encode`` (system instruction + user slot); the skip
# index counts the tokens of everything before the user text
DEFAULT_TEMPLATE = (
    "<|im_start|>system\n"
    "Describe the video by detailing the subjects, their motion, the "
    "scene, lighting and camera behaviour:<|im_end|>\n"
    "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"
)


class PromptEmbedder:
    """Per-prompt masked hidden-state extraction under a chat template.

    Args:
      model: a HF model with ``(input_ids, attention_mask) ->
        last_hidden_state`` semantics (``output_hidden_states`` supported).
      tokenizer: matching HF tokenizer (padding side is forced to left,
        like the reference).
      template: format string with one ``{}`` slot for the user prompt.
      start_idx: number of template-prefix tokens to drop from each
        sequence (reference ``prompt_template_encode_start_idx``). When
        None it is computed by tokenizing the empty template prefix.
      max_length: tokenizer truncation length (reference: 300).
    """

    def __init__(
        self,
        model: Any,
        tokenizer: Any,
        template: str = DEFAULT_TEMPLATE,
        start_idx: Optional[int] = None,
        max_length: int = 300,
    ):
        self.model = model
        self.tokenizer = tokenizer
        self.template = template
        self.max_length = max_length
        tokenizer.padding_side = "left"
        if start_idx is None:
            prefix = template.split("{}")[0]
            start_idx = len(tokenizer(prefix)["input_ids"])
        self.start_idx = start_idx

    def __call__(self, prompts: List[str]) -> List[np.ndarray]:
        import torch

        texts = [self.template.format(p) for p in prompts]
        batch = self.tokenizer(
            texts,
            padding=True,
            truncation=True,
            max_length=self.max_length + self.start_idx,
            return_tensors="pt",
        )
        with torch.no_grad():
            out = self.model(
                input_ids=batch["input_ids"],
                attention_mask=batch["attention_mask"],
                output_hidden_states=True,
            )
        hidden = (
            out.hidden_states[-1]
            if getattr(out, "hidden_states", None) is not None
            else out.last_hidden_state
        )
        embeds = []
        for i in range(hidden.shape[0]):
            keep = batch["attention_mask"][i].nonzero(as_tuple=False).squeeze(-1)
            seq = hidden[i, keep, :]  # non-padded tokens, in order
            embeds.append(seq[self.start_idx :].float().numpy())
        return embeds


def load_qwen_embedder(
    model_id: str = "Qwen/Qwen2.5-VL-3B-Instruct", **kwargs
) -> Optional[PromptEmbedder]:
    """Best-effort loader mirroring the reference constructor; returns
    None when transformers or the weights are unavailable (zero-egress
    environments)."""
    try:
        from transformers import AutoModelForCausalLM, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_id, trust_remote_code=True)
        model = AutoModelForCausalLM.from_pretrained(
            model_id, trust_remote_code=True
        ).eval()
    except Exception:
        return None
    return PromptEmbedder(model, tok, **kwargs)

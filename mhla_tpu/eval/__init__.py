from .ppl import PerplexityEvaluator, token_nll

__all__ = ["PerplexityEvaluator", "token_nll"]

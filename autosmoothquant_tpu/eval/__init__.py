from .ppl import perplexity, perplexity_from_tokens

__all__ = ["perplexity", "perplexity_from_tokens"]

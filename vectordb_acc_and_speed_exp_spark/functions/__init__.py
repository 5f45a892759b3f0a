from .vector import cosine_sim, dot, l2_dist, l2_dist_sq, l2_norm, unit_normalize
from .hashing import portable_hash64, portable_hash64_seeded
from .text import ngram_shingles, punct_ratio, token_count, tokens, word_shingles

__all__ = [
    "cosine_sim",
    "dot",
    "l2_dist",
    "l2_dist_sq",
    "l2_norm",
    "unit_normalize",
    "portable_hash64",
    "portable_hash64_seeded",
    "ngram_shingles",
    "punct_ratio",
    "token_count",
    "tokens",
    "word_shingles",
]

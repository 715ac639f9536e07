from .text import (  # noqa: F401
    tokens,
    token_count,
    punct_ratio,
    stopword_ratio,
    quality_score,
    rolling_hash,
    ascii_lower,
    content_fingerprint,
    lang_scores,
    lang_id,
)
from .vectors import cosine_similarity, dot_product, l2_norm  # noqa: F401

"""LLM-data-pipeline queries (dedup, similarity, text analysis,
multimodal) — filled in as the operators land."""

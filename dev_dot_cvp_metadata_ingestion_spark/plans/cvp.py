"""CVP-domain queries (validation, sequential, metrics) — filled in as
the operators land (SURVEY.md §2.1, §2.2, §2.4, §2.5)."""

from .registry import QUERIES, ORACLES, register, query_names  # noqa: F401

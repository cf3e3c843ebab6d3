from .queries import QUERIES, QueryDef
from . import training_queries  # noqa: F401 — registers into QUERIES

__all__ = ["QUERIES", "QueryDef"]

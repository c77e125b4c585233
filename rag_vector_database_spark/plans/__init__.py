"""Query registry backing the driver contract (__spark_entry__.py)."""

from .registry import REGISTRY, QueryDef, queries, oracle_sql  # noqa: F401

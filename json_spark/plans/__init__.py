from .registry import QUERIES, ORACLE_SQL

__all__ = ["QUERIES", "ORACLE_SQL"]

from .registry import ORACLE_SQL, SPARK_QUERIES, flagship_query

__all__ = ["ORACLE_SQL", "SPARK_QUERIES", "flagship_query"]

from .registry import QUERIES, Query, all_queries, oracle_map, query_map, register

__all__ = ["QUERIES", "Query", "all_queries", "oracle_map", "query_map", "register"]

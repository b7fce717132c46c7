"""Batch operators.

Each module exposes composable DataFrame->DataFrame functions plus registers
named queries (with DuckDB-oracle SQL twins) in ``plans.registry``.
"""

"""Analytical query catalog — the driver-facing query surface."""

from .catalog import CATALOG, Query, queries, oracle_sql

__all__ = ["CATALOG", "Query", "queries", "oracle_sql"]

"""Operator catalog modules.

Each module exposes ``QUERIES: dict[str, Callable[(spark, sf_dir), DataFrame]]``
and ``ORACLES: dict[str, str]`` (DuckDB-compatible ANSI SQL). Names missing
from ORACLES are non-SQL-expressible and get a rows-only driver check.
"""

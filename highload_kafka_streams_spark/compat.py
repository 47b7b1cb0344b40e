"""Cross-engine (Spark ↔ DuckDB oracle) determinism helpers.

The driver's correctness gate hash-compares Spark results against DuckDB
running ``oracle_sql()`` on the same parquet (row-count + schema +
order-insensitive value-hash). Floating-point summation order differs
between engines — and double→DECIMAL casts round differently (verified:
Spark's BigDecimal HALF_UP vs DuckDB's scaled-multiply diverge on
full-mantissa doubles) — so every double aggregate we emit uses an
explicit **fixed-point semantic** with an exact SQL twin:

    fixed(x) = floor(x * 10^4 + 0.5)        -- pure IEEE double ops,
                                            -- bit-identical cross-engine
    SUM(fixed(x)) over exact integers       -- order-independent
    / 10^4.0                                -- one deterministic division

Verified bit-exact between PySpark 4.1.2 and DuckDB at sf0.1 on
lineitem expressions (survey hazard list, SURVEY.md §5).

Scale note: the integer accumulator holds ~9.2e18; at 4-digit scale this
caps the true sum at ~9.2e14 ≈ a quadrillion units — fine for any
per-group aggregate at 100 TB (groups shrink the sum); for a single
global sum over 100 TB of large measures, drop ``scale`` to 2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def fixed(c: str | Column, scale: int = 4) -> Column:
    """Deterministic fixed-point integer representation of a double."""
    m = 10**scale
    return F.floor(_col(c) * m + F.lit(0.5)).cast("long")


def dsum(c: str | Column, alias: str, scale: int = 4) -> Column:
    """Order-independent double sum (exact integer arithmetic inside)."""
    return (F.sum(fixed(c, scale)) / float(10**scale)).alias(alias)


def dsum_sql(expr: str, alias: str, scale: int = 4) -> str:
    m = 10**scale
    return (
        f"SUM(CAST(FLOOR(({expr}) * {m} + 0.5) AS BIGINT)) / {m}.0 AS {alias}"
    )


def davg(c: str | Column, alias: str, scale: int = 4) -> Column:
    """Order-independent double average: exact fixed-point sum / count."""
    m = 10**scale
    return (F.sum(fixed(c, scale)) / float(m) / F.count(_col(c))).alias(alias)


def davg_sql(expr: str, alias: str, scale: int = 4) -> str:
    m = 10**scale
    return (
        f"SUM(CAST(FLOOR(({expr}) * {m} + 0.5) AS BIGINT)) / {m}.0"
        f" / COUNT({expr}) AS {alias}"
    )

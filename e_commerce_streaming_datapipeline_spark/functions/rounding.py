"""Cross-engine deterministic rounding.

Spark's ``round(x, n)`` is decimal-correct (BigDecimal HALF_UP over the
double's exact value); DuckDB's is ``std::round(x * 10^n) / 10^n``.  For
exact-half decimals (avg = 52.755) the two disagree by a cent.  ``fround``
reproduces DuckDB's mechanism with Spark built-ins — identical IEEE ops on
both engines ⇒ identical bits ⇒ stable value hashes (SURVEY §7 hard-part 2).

Use ``fround`` for every oracle-checked rounded column; plain ``F.round`` is
fine for display-only output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(col: Column, n: int = 2) -> Column:
    factor = float(10**n)
    return F.round(col * factor, 0) / factor


def cents_sum_double(col: Column) -> Column:
    """Exact order-independent money sum as a double: scaled-long cents
    accumulated exactly, divided once at the end.  The null-defaulting
    fixed-point discipline every source-stats/roundtrip query shares
    (oracle twin: ``CAST(sum(round(coalesce(x,0.0)*100)::BIGINT) AS
    DOUBLE)/100``)."""
    return (
        F.sum(F.round(F.coalesce(col, F.lit(0.0)) * 100, 0).cast("long")).cast("double")
        / 100
    )


def cents(col: Column) -> Column:
    """Scaled-long cents of a 2dp money value — exact integer representation."""
    return F.round(col * 100, 0).cast("long")


def cents_sum(col: Column) -> Column:
    """Exact order-independent money sum: scaled-long cents, to be divided
    back to currency once at the edge.  The one definition the TPC-H-shape
    modules share (was two private copies)."""
    return F.sum(cents(col))


def decimal_avg(col: Column, count_expr: Column) -> Column:
    """Exact-decimal mean: sum as DECIMAL(18,2) (exact), cast once to
    double, divide by the given count — both engines then divide the
    IDENTICAL double, where a plain double avg can land a knife-edge
    half-cent whose rounding depends on engine-specific summation order.
    Callers wrap with ``fround``.  One definition shared by the GMV,
    payment-metrics and payment-rollup aggregate sets."""
    return F.sum(col.cast("decimal(18,2)")).cast("double") / count_expr

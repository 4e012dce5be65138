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

"""Driver-canonicalizer compatibility sweep.

Round 1's only driver error was not a wrong result — it was the driver's
pandas-based canonicalizer crashing on a result COLUMN TYPE
(`sort_values → factorize → TypeError: unhashable type: 'list'` on an
ArrayType column, CORRECTNESS_r01.json).  Our oracle_compare normalizes
через strings and would never hit that.  This sweep pushes every registered
query's Spark result AND its DuckDB oracle result through the same
pandas operations the driver's traceback showed (sort by every column, then
factorize every column) and asserts they don't raise — catching the next
dropoff_hourly before the driver does.

Value equality is NOT asserted here (tests/test_oracle_parity.py owns
that); this is purely the "is the output shape driver-safe" gate.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from e_commerce_streaming_datapipeline_spark.plans.registry import all_queries

_TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "events", "documents", "embeddings")


def _canon(df: pd.DataFrame) -> None:
    """The driver-style canonical form: column-name order, full row sort,
    then factorize each column (the two calls that crashed round 1)."""
    cols = sorted(df.columns)
    out = df[cols]
    if len(out):
        out = out.sort_values(by=cols, kind="mergesort", na_position="last")
    for c in cols:
        pd.factorize(out[c])


def test_every_query_survives_driver_canonicalization(spark, sf_dir):
    con = duckdb.connect()
    for t in _TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    failures = []
    for name, q in sorted(all_queries().items()):
        try:
            spdf = q.builder(spark, sf_dir).toPandas()
            _canon(spdf)
        except Exception as exc:  # noqa: BLE001 — we want the full sweep
            failures.append(f"{name} (spark): {type(exc).__name__}: {exc}")
            continue
        if q.oracle is None:
            continue
        try:
            odf = con.execute(q.oracle).df()
            _canon(odf)
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name} (oracle): {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures)

"""Sweep every registered oracle SQL through DuckDB ``DESCRIBE`` and flag
output columns whose DuckDB type does not round-trip through the driver's
pandas canonicalizer (``con.execute(sql).df()``):

- HUGEINT / UHUGEINT  -> pandas float64 -> "3.0" vs Spark's "3" hash break
- DECIMAL(p,s)        -> pandas float64 (benign today, normalize anyway)

This is the r6-verdict gate: DuckDB returns integer ``sum()`` as HUGEINT, so
every uncast integer sum in an oracle is a latent driver hash mismatch.  No
query execution — DESCRIBE only, runs in seconds over the whole registry.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e_commerce_streaming_datapipeline_spark.plans.registry import all_queries  # noqa: E402

BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    flagged: dict[str, list[tuple[str, str]]] = {}
    skipped: list[str] = []
    for name, q in all_queries().items():
        if q.oracle is None:
            continue
        try:
            rows = con.execute(f"DESCRIBE {q.oracle}").fetchall()
        except Exception as e:
            skipped.append(f"{name}: {type(e).__name__}: {e}")
            continue
        bad = [(col, typ) for col, typ, *_ in rows
               if any(b in typ.upper() for b in BAD)]
        if bad:
            flagged[name] = bad

    for name, cols in sorted(flagged.items()):
        print(f"FLAG {name}: " + ", ".join(f"{c}::{t}" for c, t in cols))
    for s in skipped:
        print(f"SKIP {s}")
    print(f"\n{len(flagged)} flagged / {len(skipped)} describe-errors")
    if flagged:
        raise SystemExit(1)


if __name__ == "__main__":
    main()

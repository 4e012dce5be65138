"""Local replica of the driver's DuckDB-oracle compare (SURVEY §5): run a
registered Spark query and its oracle SQL side by side, compare row count +
column names + an order-insensitive value hash with tolerant float/timestamp
normalization.  Used by tests and by ``python -m tests.oracle_compare`` for
fast iteration."""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb

from pyspark.sql import SparkSession


def _norm_cell(v) -> str:
    import datetime

    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style value normalization: fixed decimal form kills
        # 1.0-vs-1 and 1e-? formatting drift
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _rows_signature(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare_query(spark: SparkSession, name: str, sf_dir: str) -> CompareResult:
    from e_commerce_streaming_datapipeline_spark.plans.registry import get_query

    q = get_query(name)
    sdf = q.builder(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    if q.oracle is None:
        return CompareResult(name, True, len(spark_rows), -1, "rows-only (no oracle)")

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    cur = con.execute(q.oracle)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()

    if sorted(spark_cols) != sorted(oracle_cols):
        return CompareResult(
            name, False, len(spark_rows), len(oracle_rows),
            f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}",
        )
    if len(spark_rows) != len(oracle_rows):
        return CompareResult(
            name, False, len(spark_rows), len(oracle_rows), "row count mismatch"
        )
    s_sig = _rows_signature(spark_cols, [tuple(r) for r in spark_rows])
    o_sig = _rows_signature(oracle_cols, oracle_rows)
    if s_sig != o_sig:
        diff = [(a, b) for a, b in zip(s_sig, o_sig) if a != b][:3]
        return CompareResult(
            name, False, len(spark_rows), len(oracle_rows),
            f"value mismatch, first diffs: {diff}",
        )
    return CompareResult(name, True, len(spark_rows), len(oracle_rows))


def main() -> None:
    import argparse

    from e_commerce_streaming_datapipeline_spark.plans.registry import all_queries
    from e_commerce_streaming_datapipeline_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    spark = get_spark(app_name="oracle-compare", shuffle_partitions=8)
    names = args.names or list(all_queries())
    failed = []
    for name in names:
        try:
            res = compare_query(spark, name, args.sf_dir)
        except Exception as e:  # show and continue
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        status = "ok" if res.ok else "FAIL"
        print(f"{status:4} {name}: spark={res.spark_rows} oracle={res.oracle_rows} {res.detail}")
        if not res.ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", ", ".join(failed))
        raise SystemExit(1)


if __name__ == "__main__":
    main()

"""Command-line surface: run, list, and explain registered queries.

The reference drives its pipeline through shell scripts
(``scripts/run_producer.sh`` / ``run_consumer.sh``); the engine-native
equivalent is one CLI over the query registry:

    python -m e_commerce_streaming_datapipeline_spark list
    python -m e_commerce_streaming_datapipeline_spark run gmv_minutely --sf-dir /root/testdata/sf0.01 -n 20
    python -m e_commerce_streaming_datapipeline_spark explain order_details
    python -m e_commerce_streaming_datapipeline_spark oracle pricing_summary
    python -m e_commerce_streaming_datapipeline_spark verify dropoff_hourly --sf-dir /root/testdata/sf0.01

``verify`` runs the DuckDB oracle compare (same method as the driver gate)
for one query or, with no name, every oracle-checked query.
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="e_commerce_streaming_datapipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries (* = oracle-checked)")

    run = sub.add_parser("run", help="run a query and show rows")
    run.add_argument("name")
    run.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    run.add_argument("-n", "--num-rows", type=int, default=20)

    exp = sub.add_parser("explain", help="formatted physical plan")
    exp.add_argument("name")
    exp.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))

    orc = sub.add_parser("oracle", help="print the query's DuckDB oracle SQL")
    orc.add_argument("name")

    ver = sub.add_parser("verify", help="DuckDB oracle compare (driver-gate method)")
    ver.add_argument("name", nargs="?")
    ver.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from e_commerce_streaming_datapipeline_spark.plans.registry import all_queries

    registry = all_queries()

    if args.cmd == "list":
        for name, q in sorted(registry.items()):
            mark = "*" if q.oracle else " "
            first_line = (q.doc or "").split("\n")[0][:90]
            print(f"{mark} {name:36s} {first_line}")
        print(f"\n{len(registry)} queries, "
              f"{sum(1 for q in registry.values() if q.oracle)} oracle-checked")
        return 0

    if args.cmd == "oracle":
        q = registry.get(args.name)
        if q is None:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        print(q.oracle or "-- no oracle (rows-only check)")
        return 0

    from e_commerce_streaming_datapipeline_spark.session import get_spark

    spark = get_spark(app_name=f"e_commerce_streaming_datapipeline-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd in ("run", "explain"):
        q = registry.get(args.name)
        if q is None:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        df = q.builder(spark, args.sf_dir)
        if args.cmd == "run":
            df.show(args.num_rows, truncate=False)
        else:
            df.explain("formatted")
        return 0

    # verify
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tests.oracle_compare import compare_query

    names = [args.name] if args.name else sorted(registry)
    failed = 0
    for name in names:
        res = compare_query(spark, name, args.sf_dir)
        status = "ok  " if res.ok else "FAIL"
        print(f"{status} {name}: spark={res.spark_rows} oracle={res.oracle_rows} {res.detail}")
        failed += 0 if res.ok else 1
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

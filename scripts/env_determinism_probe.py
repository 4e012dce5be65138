"""Environment-determinism probe: run the driver's 50-query proof window
under deliberately DIVERGENT Spark session configurations and assert the
order-insensitive value hash of every query is identical across them.

Motivation (written round 6, record corrected round 7): the probe was
built chasing the `zorder_layout_stats` driver mismatches on the theory of
environment-dependent range-exchange sampling.  The r7 root-cause proved
those mismatches were ORACLE RESULT TYPING (uncast integer sum() ->
DuckDB HUGEINT -> the driver's pandas canonicalizer renders float64), now
gated by tests/test_oracle_dtypes.py — a class this probe can never see
because it only compares Spark against Spark.  The probe remains useful
for what it actually tests: anything whose result depends on partitioning,
sampling, AQE re-planning, evaluation order, or the session timezone will
hash differently in at least one of these configs.

Configs swept (each a fresh SparkSession in the same process):
  * bench-like:  local[32], shuffle=32, AQE on
  * driver-ish:  local[4],  shuffle=200 (Spark default), AQE on
  * adversarial: local[8],  shuffle=7, AQE OFF, 1 MiB maxPartitionBytes
                 (maximum input-split fragmentation)
  * timezone:    local[16], shuffle=16, AQE on, session tz America/Sao_Paulo

Run:  python scripts/env_determinism_probe.py                # proof window
      SPARK_GRAFT_DETERMINISM_QUERIES=a,b python scripts/env_determinism_probe.py
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/env_determinism_probe.py

Exit code 1 if any query hashes differently in any config.  Results are
recorded in SCALE.md ("Environment determinism").
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

CONFIGS = {
    "bench32": {"master": "local[32]", "conf": {"spark.sql.shuffle.partitions": "32"}},
    "driver4x200": {"master": "local[4]", "conf": {"spark.sql.shuffle.partitions": "200"}},
    "adversarial": {
        "master": "local[8]",
        "conf": {
            "spark.sql.shuffle.partitions": "7",
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "1m",
        },
    },
    "tz_sao_paulo": {
        "master": "local[16]",
        "conf": {
            "spark.sql.shuffle.partitions": "16",
            "spark.sql.session.timeZone": "America/Sao_Paulo",
        },
    },
}


def _fresh_session(master: str, conf: dict[str, str]):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    b = (
        SparkSession.builder.master(master)
        .appName("determinism-probe")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in conf.items():
        b = b.config(k, v)
    return b.getOrCreate()


def _value_hash(df) -> tuple[int, str]:
    from tests.oracle_compare import _rows_signature

    rows = df.collect()
    sig = _rows_signature(df.columns, [tuple(r) for r in rows])
    return len(rows), hashlib.md5("\n".join(sig).encode()).hexdigest()


def main() -> None:
    from e_commerce_streaming_datapipeline_spark.plans.registry import all_queries

    names = list(all_queries())
    only = os.environ.get("SPARK_GRAFT_DETERMINISM_QUERIES")
    if only:
        # an explicit list selects from the FULL registry (r8 fix: the
        # window cap used to apply first and silently drop names past 50)
        wanted = {s.strip() for s in only.split(",")}
        names = [n for n in names if n in wanted]
    elif not os.environ.get("SPARK_GRAFT_DETERMINISM_ALL"):
        names = names[:50]  # default: the driver's proof window

    results: dict[str, dict[str, tuple[int, str] | str]] = {n: {} for n in names}
    resets: dict[str, dict[str, list[str]]] = {n: {} for n in names}
    for cfg_name, cfg in CONFIGS.items():
        spark = _fresh_session(cfg["master"], cfg["conf"])
        spark.sparkContext.setLogLevel("ERROR")
        registry = all_queries()
        for n in names:
            # RE-APPLY the divergent confs before EVERY query: load_table ->
            # ensure_session_conf (sources/batch.py) pins UTC/AQE-on/shuffle
            # as part of the engine contract, so after the first query the
            # session no longer carries this config's divergence — without
            # this re-set the tz/AQE/shuffle legs silently tested nothing
            # from query #2 on (r6 ADVICE finding #4).  A query that resets
            # the conf during its own build is fine (that IS the contract);
            # a query that bypasses load_table now genuinely runs under the
            # divergent conf and must still hash identically.
            for k, v in cfg["conf"].items():
                spark.conf.set(k, v)
            try:
                results[n][cfg_name] = _value_hash(registry[n].builder(spark, SF_DIR))
            except Exception as exc:  # noqa: BLE001 — full sweep wanted
                results[n][cfg_name] = f"ERROR: {type(exc).__name__}: {exc}"[:200]
            resets[n][cfg_name] = [
                k for k, v in cfg["conf"].items()
                if spark.conf.get(k, None) != v
            ]
        spark.stop()

    divergent = []
    for n, per_cfg in results.items():
        vals = set(map(str, per_cfg.values()))
        status = "ok" if len(vals) == 1 else "DIVERGENT"
        if status == "DIVERGENT":
            divergent.append(n)
        reset_note = {f"{c}_conf_reset_by_build": v
                      for c, v in resets[n].items() if v}
        print(json.dumps({"query": n, "status": status,
                          **{k: str(v) for k, v in per_cfg.items()},
                          **reset_note}))

    print(f"\n{len(names) - len(divergent)}/{len(names)} environment-stable "
          f"across {len(CONFIGS)} configs at {SF_DIR}")
    if divergent:
        print("DIVERGENT:", ", ".join(divergent))
        sys.exit(1)


if __name__ == "__main__":
    main()

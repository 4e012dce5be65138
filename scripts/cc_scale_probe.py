"""Connected-components round-complexity probe: measure WHY the
large-star/small-star variant (`operators/graph.py::star_component_labels`)
exists alongside the min-label-propagation loop (`q_supplier_components`).

Propagation moves the minimum label ONE HOP per round — O(diameter) Spark
jobs.  Star rewiring halves path lengths every alternation — O(log n)
rounds regardless of diameter.  The fixture's co-part graph is
diameter-~3, so the bench never shows the difference; this probe builds
PATH graphs (the worst case: diameter = n-1) and measures both loops'
round counts and wall time, verifying both label every node with the
component minimum.

Propagation is run only at small n (rounds = n-1 — the point of the
probe); star runs to 100k-node paths where propagation would need 100k
jobs.  Results print as one JSON line and are written into SCALE.md
between the CC_SCALE markers by --update-scale-md.

Run:  python scripts/cc_scale_probe.py [--update-scale-md]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def propagation_labels(edges, nodes, max_rounds: int):
    """The q_supplier_components loop verbatim (uncapped for measurement):
    min-label propagation, one equi-join + min-agg per round."""
    from pyspark.sql import functions as F

    labels = nodes.select("node", F.col("node").alias("label")).persist()
    rounds = 0
    for _round in range(max_rounds):
        sym = edges.unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        neighbor_min = (
            sym.join(labels, sym["u"] == labels["node"])
            .select(F.col("v").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()  # same lineage-truncation need as the star loop
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        rounds = _round + 1
        if changed == 0:
            break
    return labels, rounds


def path_graph(spark, n: int):
    """Path 1-2-...-n as canonical (u > v) edges — diameter n-1."""
    from pyspark.sql import functions as F

    nodes = spark.range(1, n + 1).select(F.col("id").alias("node"))
    edges = (
        spark.range(2, n + 1)
        .select(F.col("id").alias("u"), (F.col("id") - 1).alias("v"))
        .repartition(8)
    )
    return edges, nodes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update-scale-md", action="store_true")
    args = ap.parse_args()

    import os

    from e_commerce_streaming_datapipeline_spark.operators.graph import (
        star_component_labels,
    )
    from e_commerce_streaming_datapipeline_spark.session import get_spark

    # tiny graphs, many rounds: per-round JOB LATENCY dominates, so keep the
    # shuffle width small — 32-way shuffles on a 64-row relation measure the
    # scheduler, not the algorithm
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="cc-scale-probe", master=f"local[{cpus}]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    report: dict = {"graph": "path (diameter = n-1)"}
    rows = []
    for n, run_prop in [(64, True), (256, True), (4096, False), (100_000, False)]:
        print(f"-- n={n} (prop={run_prop})", file=sys.stderr, flush=True)
        edges, nodes = path_graph(spark, n)
        stats: dict = {}
        t0 = time.perf_counter()
        labels = star_component_labels(edges, nodes, max_rounds=60, stats=stats)
        ok = (
            labels.agg(
                F.max("label").alias("mx"), F.count("*").alias("cnt")
            ).collect()[0]
        )
        star_wall = time.perf_counter() - t0
        assert ok["mx"] == 1 and ok["cnt"] == n, f"star mislabels at n={n}: {ok}"
        entry = {
            "n": n,
            "star_rounds": stats["rounds"],
            "star_wall_sec": round(star_wall, 1),
        }
        if run_prop:
            t0 = time.perf_counter()
            plabels, prounds = propagation_labels(edges, nodes, max_rounds=n + 1)
            pok = plabels.agg(
                F.max("label").alias("mx"), F.count("*").alias("cnt")
            ).collect()[0]
            plabels.unpersist()
            prop_wall = time.perf_counter() - t0
            assert pok["mx"] == 1 and pok["cnt"] == n
            entry["prop_rounds"] = prounds
            entry["prop_wall_sec"] = round(prop_wall, 1)
        rows.append(entry)
    report["rows"] = rows
    print(json.dumps(report))
    spark.stop()

    if args.update_scale_md:
        begin, end = "<!-- CC_SCALE:BEGIN -->", "<!-- CC_SCALE:END -->"
        body = [
            begin,
            "Measured (scripts/cc_scale_probe.py: PATH graphs — diameter n-1, the",
            "worst case for hop-at-a-time propagation; both loops verified to label",
            "every node with the component minimum, local[32]):",
            "",
            "| n (path nodes) | propagation rounds | propagation wall (s) | star rounds | star wall (s) |",
            "|---|---|---|---|---|",
        ]
        for e in rows:
            body.append(
                f"| {e['n']:,} | {e.get('prop_rounds', '— (= n-1, not run)')} | "
                f"{e.get('prop_wall_sec', '—')} | {e['star_rounds']} | "
                f"{e['star_wall_sec']} |"
            )
        body += [
            "",
            "Propagation rounds grow linearly with the diameter (one hop per",
            "round); star rewiring stays logarithmic — at 100k-node diameter the",
            "propagation loop would need ~100k Spark jobs, which is why",
            "`supplier_components_star` exists and why its per-round relations are",
            "`localCheckpoint`ed (exponential-lineage pitfall, see its docstring).",
            end,
        ]
        block = "\n".join(body)
        scale_md = REPO / "SCALE.md"
        text = scale_md.read_text()
        pattern = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.DOTALL)
        if pattern.search(text):
            text = pattern.sub(lambda _: block, text)
        else:
            text += "\n\n## Connected components at scale — measured\n\n" + block + "\n"
        scale_md.write_text(text)
        print("SCALE.md updated (CC_SCALE block)", file=sys.stderr)


if __name__ == "__main__":
    main()

"""ANN at realistic N (VERDICT r2 task 6): measure LSH / IVF candidate
pruning, recall, and wall time against exact ground truth on a derived
fixture of >=100k vectors.

The sf0.1 embeddings table (2,000 x dim-64) is replicated with small
deterministic Gaussian jitter up to ``--n`` vectors (labels preserved, new
vec_ids), which keeps the corpus geometry realistic (clustered, near-dup
heavy) without synthesizing an unrelated dataset.  Ground truth is exact
cosine top-k computed with a numpy matmul on the driver (51 MB at n=200k —
fine here; at 10^9 the ground truth would itself be a Spark job, which is
exactly why the pruned variants exist).

Measured per variant: wall time of the full Spark pipeline (signatures /
cluster assignment -> candidate equi-join -> exact rerank -> top-k),
candidate ratio (pairs scored / Q*N), and recall@k vs exact.  Results print
as one JSON line and are written into SCALE.md between the ANN_SCALE
markers by --update-scale-md.

Run:  python scripts/ann_scale_probe.py --n 200000 --queries 64 [--update-scale-md]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TOP_K = 10


def build_fixture(sf_dir: str, n: int) -> str:
    """Jitter-replicated parquet fixture, cached by target size."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(tempfile.gettempdir(), "e_commerce_streaming_datapipeline_ann", f"n{n}")
    out = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    base = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    base_n = base.num_rows
    dim = len(base["embedding"][0])
    mat = np.asarray(base["embedding"].combine_chunks().flatten(), dtype=np.float32)
    mat = mat.reshape(base_n, dim)
    labels = np.asarray(base["label"].to_pylist(), dtype=np.int32)
    reps = (n + base_n - 1) // base_n
    chunks = []
    for r in range(reps):
        if r == 0:
            m = mat
        else:
            rng = np.random.RandomState(1234 + r)  # deterministic per replica
            m = mat + rng.normal(0.0, 0.05, size=mat.shape).astype(np.float32)
        ids = np.arange(base_n, dtype=np.int64) + r * base_n
        chunks.append(
            pa.table(
                {
                    "vec_id": pa.array(ids),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(m.reshape(-1), pa.float32()), dim
                    ).cast(pa.list_(pa.float32())),
                    "label": pa.array(labels),
                }
            )
        )
    tbl = pa.concat_tables(chunks).slice(0, n)
    pq.write_table(tbl, out)
    return out_dir


def exact_topk_numpy(fix_dir: str, n_queries: int) -> dict[int, list[int]]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(fix_dir, "embeddings.parquet"))
    dim = len(tbl["embedding"][0])
    mat = np.asarray(tbl["embedding"].combine_chunks().flatten(), dtype=np.float64)
    mat = mat.reshape(tbl.num_rows, dim)
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    mat, ids = mat[order], ids[order]
    norms = np.linalg.norm(mat, axis=1)
    q = mat[:n_queries] / norms[:n_queries, None]
    sims = q @ (mat / norms[:, None]).T  # (Q, N)
    truth: dict[int, list[int]] = {}
    for qi in range(n_queries):
        s = sims[qi].copy()
        s[qi] = -np.inf  # exclude self
        top = np.argpartition(-s, TOP_K)[:TOP_K]
        top = top[np.argsort(-s[top], kind="stable")]
        truth[int(ids[qi])] = [int(ids[t]) for t in top]
    return truth


def spark_variants(fix_dir: str, n_queries: int, n: int):
    from pyspark.sql import functions as F

    from e_commerce_streaming_datapipeline_spark.functions.rounding import fround
    from e_commerce_streaming_datapipeline_spark.functions.vector import (
        cosine_similarity_expr,
        to_double_array,
    )
    from e_commerce_streaming_datapipeline_spark.operators.similarity import _lsh_band_sigs
    from e_commerce_streaming_datapipeline_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="ann-scale-probe", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = (
        spark.read.parquet(os.path.join(fix_dir, "embeddings.parquet"))
        .select("vec_id", "label", to_double_array("embedding").alias("e"))
        .repartition(cpus)
        .localCheckpoint()  # isolate scan cost from the measured pipelines
    )
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("e").alias("qe"),
    )

    def rank_and_collect(scored):
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id")
        )
        out = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= TOP_K)
            .collect()
        )
        got: dict[int, list[int]] = {}
        for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
            got.setdefault(r["query_id"], []).append(r["neighbor_id"])
        return got

    def run(name, cands_builder):
        t0 = time.perf_counter()
        cands = cands_builder()
        scored = (
            cands.join(F.broadcast(queries.select("query_id", "qe")), "query_id")
            .join(emb.select(F.col("vec_id").alias("neighbor_id"), "e"), "neighbor_id")
            .select(
                "query_id",
                "neighbor_id",
                fround(cosine_similarity_expr(F.col("qe"), F.col("e")), 6).alias(
                    "cos_sim"
                ),
            )
        )
        got = rank_and_collect(scored)
        wall = time.perf_counter() - t0
        n_cands = cands.count()
        return got, wall, n_cands

    def lsh_cands():
        sigs = _lsh_band_sigs(emb).localCheckpoint()
        bands_long = sigs.select(
            "vec_id",
            F.posexplode(F.array("band0", "band1")).alias("band_idx", "band_val"),
        )
        qbands = bands_long.where(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), "band_idx", "band_val"
        )
        return (
            F.broadcast(qbands)
            .join(bands_long, ["band_idx", "band_val"])
            .where(F.col("query_id") != F.col("vec_id"))
            .select("query_id", F.col("vec_id").alias("neighbor_id"))
            .distinct()
        )

    def ivf_cands():
        return (
            F.broadcast(queries.select("query_id", "qlabel"))
            .join(emb.select("vec_id", "label"), F.col("qlabel") == F.col("label"))
            .where(F.col("query_id") != F.col("vec_id"))
            .select("query_id", F.col("vec_id").alias("neighbor_id"))
        )

    results = {}
    for name, builder in [("lsh", lsh_cands), ("ivf", ivf_cands)]:
        got, wall, n_cands = run(name, builder)
        results[name] = {"got": got, "wall_sec": round(wall, 2), "n_candidates": n_cands}

    # ---- trained IVF (VERDICT r3 task #5): k-means learned IN the engine
    # (seed vec_id % K, 2 Lloyd iterations, double arithmetic — the
    # oracle-checked integer-exact twin is operators/similarity.py::
    # q_trained_ivf_topk; the probe measures the same plan shape at N) ----
    K_TRAIN = 64
    sq_dist = F.aggregate(
        F.zip_with(F.col("e"), F.col("c_arr"), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )

    def cents_of(assigned):
        return (
            assigned.select("cluster", F.posexplode("e").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy(F.col("cluster").alias("c_label"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda p: p["m"],
                ).alias("c_arr")
            )
        )

    def assign_nearest(vectors, cents):
        # crossJoin(broadcast) then map-side min_by partial agg: the K-way
        # fan-out collapses to one row per vector BEFORE any shuffle
        return (
            vectors.crossJoin(F.broadcast(cents))
            .select("vec_id", "e", "c_label", sq_dist.alias("d"))
            .groupBy("vec_id")
            .agg(
                F.min_by("c_label", "d").alias("cluster"),
                F.any_value("e").alias("e"),
            )
        )

    t0 = time.perf_counter()
    assigned = emb.select("vec_id", "e", (F.col("vec_id") % K_TRAIN).alias("cluster"))
    cents = None
    for _ in range(2):
        cents = cents_of(assigned).localCheckpoint()
        assigned = assign_nearest(emb, cents)
    index = assigned.localCheckpoint()  # freeze the trained index
    train_wall = time.perf_counter() - t0

    from pyspark.sql import Window as _W

    q_assign = (
        queries.select("query_id", F.col("qe").alias("e"))
        .crossJoin(F.broadcast(cents))
        .select("query_id", "c_label", sq_dist.alias("d"))
        .withColumn(
            "probe_rank",
            F.row_number().over(_W.partitionBy("query_id").orderBy("d", "c_label")),
        )
        .localCheckpoint()
    )
    results["trained_ivf"] = {"train_wall_sec": round(train_wall, 2), "k": K_TRAIN}
    for nprobe in (1, 2, 4):

        def trained_cands(nprobe=nprobe):
            return (
                F.broadcast(
                    q_assign.where(F.col("probe_rank") <= nprobe).select(
                        "query_id", "c_label"
                    )
                )
                .join(
                    index.select("vec_id", "cluster"),
                    F.col("c_label") == F.col("cluster"),
                )
                .where(F.col("query_id") != F.col("vec_id"))
                .select("query_id", F.col("vec_id").alias("neighbor_id"))
            )

        got, wall, n_cands = run(f"trained_ivf_p{nprobe}", trained_cands)
        results["trained_ivf"][f"nprobe{nprobe}"] = {
            "got": got,
            "wall_sec": round(wall, 2),
            "n_candidates": n_cands,
        }

    # ---- PQ (product quantization, Jégou et al.): 8x256 codebooks trained
    # with 2 Lloyd rounds, ADC scoring in an Arrow kernel — the oracle-checked
    # integer-exact twin is operators/similarity.py::q_embedding_topk_pq; the
    # probe measures the production shape (numpy codebook broadcast into
    # mapInPandas, per-batch top-R shortlist, exact rerank) at N.
    # Shortlist depth matters on THIS fixture: the corpus is jitter-replicated
    # (near-dup heavy), so a query's true neighbors share its exact code word
    # in every subspace — ADC ties at the replica depth and cannot rank inside
    # a quantization cell.  That is the textbook reason deployed PQ always
    # carries an exact-rerank tier; R must exceed the tie depth. ----
    PQ_M, PQ_K, PQ_R = 8, 256, 500
    DIM = 64
    SUBDIM = DIM // PQ_M

    import pandas as pd
    import pyarrow.parquet as _pq

    # L2-normalize so ADC's Euclidean ranking matches the cosine truth
    emb_norm = (
        emb.withColumn(
            "nrm",
            F.sqrt(
                F.aggregate(
                    F.transform("e", lambda x: x * x),
                    F.lit(0.0),
                    lambda a, t: a + t,
                )
            ),
        )
        .select(
            "vec_id", F.transform("e", lambda x: x / F.col("nrm")).alias("e")
        )
        .localCheckpoint()
    )

    def _first_rows_np(k: int) -> np.ndarray:
        tbl = _pq.read_table(os.path.join(fix_dir, "embeddings.parquet"))
        dim = len(tbl["embedding"][0])
        mat = np.asarray(
            tbl["embedding"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(tbl.num_rows, dim)
        ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
        order = np.argsort(ids)
        mat = mat[order][:k]
        return mat / np.linalg.norm(mat, axis=1)[:, None]

    def _assign_kernel(cent_np: np.ndarray):
        # cent_np: (M, K, SUBDIM); emits one code per (row, subspace)
        def fn(it):
            for pdf in it:
                X = np.asarray(pdf["e"].tolist(), dtype=np.float64)
                cols = {"vec_id": pdf["vec_id"].values}
                for m in range(PQ_M):
                    S = X[:, m * SUBDIM : (m + 1) * SUBDIM]
                    C = cent_np[m]
                    d = (
                        (S * S).sum(1)[:, None]
                        - 2.0 * (S @ C.T)
                        + (C * C).sum(1)[None, :]
                    )
                    cols[f"c{m}"] = d.argmin(1).astype(np.int32)
                yield pd.DataFrame(cols)

        return fn

    code_schema = "vec_id long, " + ", ".join(f"c{m} int" for m in range(PQ_M))

    t0 = time.perf_counter()
    cent_np = _first_rows_np(PQ_K).reshape(PQ_K, PQ_M, SUBDIM).transpose(1, 0, 2)
    cent_np = np.ascontiguousarray(cent_np)
    for _ in range(2):
        codes_df = emb_norm.mapInPandas(_assign_kernel(cent_np), code_schema)
        sub_structs = F.array(
            *[
                F.struct(
                    F.lit(m).alias("sub"),
                    F.col(f"c{m}").alias("code"),
                    F.slice("e", m * SUBDIM + 1, SUBDIM).alias("sv"),
                )
                for m in range(PQ_M)
            ]
        )
        cent_rows = (
            emb_norm.join(codes_df, "vec_id")
            .select(F.explode(sub_structs).alias("p"))
            .select("p.*")
            .select("sub", "code", F.posexplode("sv").alias("dim", "x"))
            .groupBy("sub", "code", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()  # bounded: M*K*SUBDIM = 16,384 rows regardless of N
        )
        for r in cent_rows:  # empty clusters keep their previous centroid
            cent_np[r["sub"], r["code"], r["dim"]] = r["m"]
    codes = emb_norm.mapInPandas(_assign_kernel(cent_np), code_schema).localCheckpoint()
    pq_train_wall = time.perf_counter() - t0

    q_np = _first_rows_np(n_queries)
    # distance table: (Q, M, K)
    dtab = np.empty((n_queries, PQ_M, PQ_K))
    for m in range(PQ_M):
        S = q_np[:, m * SUBDIM : (m + 1) * SUBDIM]
        C = cent_np[m]
        dtab[:, m, :] = (
            (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) + (C * C).sum(1)[None, :]
        )

    def _adc_kernel(it):
        # per-batch ADC scores for all queries + local top-R shortlist
        for pdf in it:
            ids = pdf["vec_id"].values
            cmat = np.stack(
                [pdf[f"c{m}"].values for m in range(PQ_M)], axis=1
            )  # (b, M)
            # scores: (Q, b) via table gathers
            scores = np.zeros((n_queries, len(pdf)))
            for m in range(PQ_M):
                scores += dtab[:, m, cmat[:, m]]
            r = min(PQ_R, len(pdf))
            out_q, out_id, out_d = [], [], []
            for qi in range(n_queries):
                s = scores[qi]
                top = np.argpartition(s, r - 1)[:r]
                out_q.append(np.full(r, qi, dtype=np.int64))
                out_id.append(ids[top])
                out_d.append(s[top])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_id),
                    "adc_d": np.concatenate(out_d),
                }
            )

    from pyspark.sql import Window as _W2

    t0 = time.perf_counter()
    shortlist = (
        codes.mapInPandas(_adc_kernel, "query_id long, neighbor_id long, adc_d double")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "arank",
            F.row_number().over(
                _W2.partitionBy("query_id").orderBy("adc_d", "neighbor_id")
            ),
        )
        .where(F.col("arank") <= PQ_R)
        .localCheckpoint()
    )
    adc_rows = shortlist.where(F.col("arank") <= TOP_K).collect()
    pq_adc_got: dict[int, list[int]] = {}
    for r in sorted(adc_rows, key=lambda r: (r["query_id"], r["arank"])):
        pq_adc_got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    pq_adc_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    rerank_scored = (
        F.broadcast(shortlist.select("query_id", "neighbor_id"))
        .join(queries.select("query_id", "qe"), "query_id")
        .join(emb.select(F.col("vec_id").alias("neighbor_id"), "e"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            fround(cosine_similarity_expr(F.col("qe"), F.col("e")), 6).alias(
                "cos_sim"
            ),
        )
    )
    pq_rerank_got = rank_and_collect(rerank_scored)
    pq_rerank_wall = time.perf_counter() - t0

    results["pq"] = {
        "train_wall_sec": round(pq_train_wall, 2),
        "m": PQ_M,
        "k": PQ_K,
        "shortlist": PQ_R,
        "code_bytes_ratio": (PQ_M * 1.0) / (DIM * 4.0),  # 1-byte codes vs fp32
        "adc": {"got": pq_adc_got, "wall_sec": round(pq_adc_wall, 2)},
        "rerank": {"got": pq_rerank_got, "wall_sec": round(pq_rerank_wall, 2)},
    }

    # ---- IVF-ADC: the composed billion-scale architecture (FAISS IVFADC):
    # trained-IVF cluster pruning chooses WHICH vectors are scored, PQ codes
    # choose WHAT is scored, exact cosine reranks the survivors.  Reuses the
    # trained index (nprobe=2) and the PQ codes built above — search-phase
    # wall only; the index builds are priced in their own sections. ----
    IVFADC_NPROBE = 2

    def _adc_pair_kernel(it):
        # per-(query, candidate) ADC score via distance-table gathers —
        # fully vectorized: query ids are 0..Q-1, directly indexable
        for pdf in it:
            q_arr = pdf["query_id"].values
            acc = np.zeros(len(pdf))
            for m in range(PQ_M):
                acc += dtab[q_arr, m, pdf[f"c{m}"].values]
            yield pd.DataFrame(
                {
                    "query_id": q_arr,
                    "neighbor_id": pdf["neighbor_id"].values,
                    "adc_d": acc,
                }
            )

    t0 = time.perf_counter()
    ivf_cand_codes = (
        F.broadcast(
            q_assign.where(F.col("probe_rank") <= IVFADC_NPROBE).select(
                "query_id", "c_label"
            )
        )
        .join(index.select("vec_id", "cluster"), F.col("c_label") == F.col("cluster"))
        .where(F.col("query_id") != F.col("vec_id"))
        .join(codes, "vec_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            *[f"c{m}" for m in range(PQ_M)],
        )
    )
    n_ivfadc_cands = ivf_cand_codes.count()
    ivfadc_short = (
        ivf_cand_codes.mapInPandas(
            _adc_pair_kernel, "query_id long, neighbor_id long, adc_d double"
        )
        .withColumn(
            "arank",
            F.row_number().over(
                _W2.partitionBy("query_id").orderBy("adc_d", "neighbor_id")
            ),
        )
        .where(F.col("arank") <= PQ_R)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )
    ivfadc_scored = (
        F.broadcast(ivfadc_short)
        .join(queries.select("query_id", "qe"), "query_id")
        .join(emb.select(F.col("vec_id").alias("neighbor_id"), "e"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            fround(cosine_similarity_expr(F.col("qe"), F.col("e")), 6).alias(
                "cos_sim"
            ),
        )
    )
    ivfadc_got = rank_and_collect(ivfadc_scored)
    ivfadc_wall = time.perf_counter() - t0
    results["ivfadc"] = {
        "nprobe": IVFADC_NPROBE,
        "got": ivfadc_got,
        "wall_sec": round(ivfadc_wall, 2),
        "n_candidates": n_ivfadc_cands,
    }

    # brute force measured at a REDUCED query count purely to bound probe
    # runtime: per-query cost is what we report (it is query-independent)
    brute_q = min(8, n_queries)
    t0 = time.perf_counter()
    scored = (
        F.broadcast(
            queries.where(F.col("query_id") < brute_q).select("query_id", "qe")
        )
        .join(emb, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            fround(cosine_similarity_expr(F.col("qe"), F.col("e")), 6).alias("cos_sim"),
        )
    )
    rank_and_collect(scored)
    brute_wall = time.perf_counter() - t0
    results["brute"] = {
        "wall_sec": round(brute_wall, 2),
        "n_candidates": brute_q * (n - 1),
        "n_queries": brute_q,
    }
    spark.stop()
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--update-scale-md", action="store_true")
    args = ap.parse_args()

    fix_dir = build_fixture(args.sf_dir, args.n)
    truth = exact_topk_numpy(fix_dir, args.queries)
    res = spark_variants(fix_dir, args.queries, args.n)

    report = {"n_vectors": args.n, "n_queries": args.queries, "top_k": TOP_K}
    for name in ("lsh", "ivf"):
        got = res[name]["got"]
        hits = sum(
            len(set(got.get(q, [])) & set(t)) for q, t in truth.items()
        )
        recall = hits / (len(truth) * TOP_K)
        report[name] = {
            "recall_at_10": round(recall, 4),
            "candidate_ratio": round(
                res[name]["n_candidates"] / (args.queries * args.n), 5
            ),
            "wall_sec": res[name]["wall_sec"],
            "n_candidates": res[name]["n_candidates"],
        }
    report["brute"] = {
        "wall_sec_per_query": round(
            res["brute"]["wall_sec"] / res["brute"]["n_queries"], 3
        ),
        "candidate_ratio": 1.0,
        "n_queries_measured": res["brute"]["n_queries"],
    }
    tiv = res["trained_ivf"]
    report["trained_ivf"] = {"train_wall_sec": tiv["train_wall_sec"], "k": tiv["k"]}
    for nprobe in (1, 2, 4):
        r = tiv[f"nprobe{nprobe}"]
        hits = sum(len(set(r["got"].get(q, [])) & set(t)) for q, t in truth.items())
        report["trained_ivf"][f"nprobe{nprobe}"] = {
            "recall_at_10": round(hits / (len(truth) * TOP_K), 4),
            "candidate_ratio": round(r["n_candidates"] / (args.queries * args.n), 5),
            "wall_sec": r["wall_sec"],
        }
    pqr = res["pq"]

    def _recall(got) -> float:
        hits = sum(len(set(got.get(q, [])) & set(t)) for q, t in truth.items())
        return round(hits / (len(truth) * TOP_K), 4)

    report["pq"] = {
        "train_wall_sec": pqr["train_wall_sec"],
        "m": pqr["m"],
        "k": pqr["k"],
        "code_bytes_ratio": round(pqr["code_bytes_ratio"], 4),
        "adc": {
            "recall_at_10": _recall(pqr["adc"]["got"]),
            "wall_sec": pqr["adc"]["wall_sec"],
        },
        "rerank": {
            "recall_at_10": _recall(pqr["rerank"]["got"]),
            "wall_sec": pqr["rerank"]["wall_sec"],
            "shortlist": pqr["shortlist"],
        },
    }
    iv = res["ivfadc"]
    report["ivfadc"] = {
        "nprobe": iv["nprobe"],
        "recall_at_10": _recall(iv["got"]),
        "candidate_ratio": round(iv["n_candidates"] / (args.queries * args.n), 5),
        "wall_sec": iv["wall_sec"],
    }
    line = json.dumps(report)
    print(line)

    if args.update_scale_md:
        # MERGE rows by N into the existing multi-scale table — a plain
        # rewrite would clobber the other scales' committed measurements
        scale_md = REPO / "SCALE.md"
        text = scale_md.read_text()
        begin, end = "<!-- ANN_SCALE:BEGIN -->", "<!-- ANN_SCALE:END -->"
        pattern = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.DOTALL)
        m = pattern.search(text)
        n_label = f"{args.n // 1000}k" if args.n < 1_000_000 else f"{args.n // 1_000_000}M"
        lsh, ivf, brute = report["lsh"], report["ivf"], report["brute"]
        tiv = report["trained_ivf"]
        new_rows = {
            n_label: [
                f"| {n_label} | LSH (2x8-bit bands, equi-join) | "
                f"{lsh['candidate_ratio']:.2%} | {lsh['recall_at_10']:.1%} | {lsh['wall_sec']} |",
                f"| {n_label} | IVF (label clusters, equi-join) | "
                f"{ivf['candidate_ratio']:.2%} | {ivf['recall_at_10']:.1%} | {ivf['wall_sec']} |",
                *[
                    f"| {n_label} | Trained IVF (k={tiv['k']} in-engine k-means, "
                    f"nprobe={p}) | "
                    f"{tiv[f'nprobe{p}']['candidate_ratio']:.2%} | "
                    f"{tiv[f'nprobe{p}']['recall_at_10']:.1%} | "
                    f"{tiv[f'nprobe{p}']['wall_sec']} "
                    f"(+{tiv['train_wall_sec']} train) |"
                    for p in (1, 2, 4)
                ],
                f"| {n_label} | PQ 8x256 ADC (1-byte codes, "
                f"{report['pq']['code_bytes_ratio']:.2%} of fp32 bytes scanned) | "
                f"100% | {report['pq']['adc']['recall_at_10']:.1%} | "
                f"{report['pq']['adc']['wall_sec']} "
                f"(+{report['pq']['train_wall_sec']} train) |",
                f"| {n_label} | PQ ADC + exact rerank of top-"
                f"{report['pq']['rerank']['shortlist']} | 100% | "
                f"{report['pq']['rerank']['recall_at_10']:.1%} | "
                f"{report['pq']['rerank']['wall_sec']} |",
                f"| {n_label} | IVF-ADC (nprobe={report['ivfadc']['nprobe']} "
                f"pruning × PQ codes × rerank — the FAISS composition) | "
                f"{report['ivfadc']['candidate_ratio']:.2%} | "
                f"{report['ivfadc']['recall_at_10']:.1%} | "
                f"{report['ivfadc']['wall_sec']} |",
                f"| {n_label} | Brute force (baseline, excluded from bench at this N) | "
                f"100% | 100% | {brute['wall_sec_per_query']} /query |",
            ]
        }
        kept: dict[str, list[str]] = {}
        trailer: list[str] = []
        if m:
            for line in m.group(0).splitlines():
                row = re.match(r"\|\s*(\d+[kM])\s*\|", line)
                if row and row.group(1) not in new_rows:
                    kept.setdefault(row.group(1), []).append(line)
                elif line.startswith("Reading:") or (trailer and not line.startswith(("|", begin, end))):
                    trailer.append(line)
        all_rows = {**kept, **new_rows}
        body = [
            begin,
            "Measured (scripts/ann_scale_probe.py: dim-64 vectors derived from sf0.1 by",
            f"jittered replication, {args.queries} queries, k={TOP_K}, local[32]):",
            "",
            "| N | Variant | Candidate ratio | Recall@10 | Wall (s) |",
            "|---|---|---|---|---|",
        ]
        for label in sorted(all_rows, key=lambda s: (s.endswith("M"), s)):
            body += all_rows[label]
        if trailer:
            body += [""] + trailer
        body.append(end)
        block = "\n".join(body)
        if m:
            text = pattern.sub(lambda _: block, text)
        else:
            text += "\n\n## ANN at scale — measured\n\n" + block + "\n"
        scale_md.write_text(text)
        print("SCALE.md updated (merged by N)", file=sys.stderr)


if __name__ == "__main__":
    main()

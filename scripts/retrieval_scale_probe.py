"""Retrieval at realistic corpus sizes: measure the BM25 postings-filter
advantage against the full-vocabulary TF-IDF shuffle on a derived fixture of
replicated documents.

The sf0.1 documents table (~50k docs) is replicated up to ``--n`` documents
(new doc_ids, one replica-tag token appended so replicas are not byte-equal),
and two pipelines run over the same derived corpus:

* ``bm25_topk`` — the term filter sits on the exploded postings BELOW the
  aggregation, so only the 3 query terms' posting lists shuffle;
* ``tfidf_top_terms`` — the all-terms baseline: every (doc, term) posting
  shuffles into the tf aggregation.

Both scale linearly in scan cost; the gap is the shuffled-postings volume —
the quantity an inverted index (or this filter-first plan) removes.  Results
print as one JSON line and are written into SCALE.md between the
RETRIEVAL_SCALE markers by --update-scale-md.

Run:  python scripts/retrieval_scale_probe.py --n 500000 [--update-scale-md]
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

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_fixture(sf_dir: str, n: int) -> str:
    """Replicated documents fixture (other tables symlinked), cached by size."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out_dir = os.path.join(
        tempfile.gettempdir(), "e_commerce_streaming_datapipeline_retrieval", f"n{n}"
    )
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = os.path.join(out_dir, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(sf_dir, f), dst)
    base = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    reps = []
    total = 0
    r = 0
    while total < n:
        take = min(base.num_rows, n - total)
        chunk = base.slice(0, take)
        ids = pc.add(chunk["doc_id"], r * base.num_rows)
        text = pc.binary_join_element_wise(
            pc.cast(chunk["text"], pa.string()), f"rep{r}", " "
        )
        reps.append(
            pa.Table.from_arrays(
                [ids, text, chunk["lang"], chunk["source"], chunk["n_chars"]],
                names=base.column_names,
            )
        )
        total += take
        r += 1
    pq.write_table(pa.concat_tables(reps), out)
    return out_dir


def timed(fn, *args) -> float:
    t0 = time.perf_counter()
    fn(*args).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--update-scale-md", action="store_true")
    args = ap.parse_args()

    from e_commerce_streaming_datapipeline_spark.operators.retrieval import q_bm25_topk
    from e_commerce_streaming_datapipeline_spark.operators.text import q_tfidf_top_terms
    from e_commerce_streaming_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="retrieval-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for label, sf_dir in (("base", SF_DIR), (f"{args.n}", build_fixture(SF_DIR, args.n))):
        import duckdb

        n_docs = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchone()[0]
        # warm then min-of-2, matching bench.py methodology
        for fn in (q_bm25_topk, q_tfidf_top_terms):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        bm25 = min(timed(q_bm25_topk, spark, sf_dir) for _ in range(2))
        tfidf = min(timed(q_tfidf_top_terms, spark, sf_dir) for _ in range(2))
        rows.append({"n_docs": n_docs, "bm25_s": bm25, "tfidf_all_terms_s": tfidf})

    result = {"metric": "retrieval_scale_probe", "rows": rows}
    print(json.dumps(result))

    if args.update_scale_md:
        md = [
            "Measured (scripts/retrieval_scale_probe.py: sf0.1 documents",
            "replicated, min-of-2 after warmup, local[32]):",
            "",
            "| N docs | BM25 (postings-filtered) | TF-IDF (all terms shuffle) |",
            "|---|---|---|",
        ]
        for r in rows:
            md.append(
                f"| {r['n_docs']:,} | {r['bm25_s']} s | {r['tfidf_all_terms_s']} s |"
            )
        md += [
            "",
            "Reading: both pipelines scan the full corpus, but BM25 shuffles",
            "only the query terms' postings while TF-IDF shuffles every",
            "(doc, term) pair — the gap is the shuffled-postings volume and",
            "widens with vocabulary size; at index-backed scale the BM25 scan",
            "itself is replaced by posting-list lookups with the same plan",
            "shape (equi-join on term).",
        ]
        scale_md = REPO / "SCALE.md"
        text = scale_md.read_text()
        block = (
            "<!-- RETRIEVAL_SCALE:BEGIN -->\n" + "\n".join(md) + "\n<!-- RETRIEVAL_SCALE:END -->"
        )
        if "RETRIEVAL_SCALE:BEGIN" in text:
            text = re.sub(
                r"<!-- RETRIEVAL_SCALE:BEGIN -->.*?<!-- RETRIEVAL_SCALE:END -->",
                block,
                text,
                flags=re.S,
            )
        else:
            text += "\n## Retrieval at scale — measured\n\n" + block + "\n"
        scale_md.write_text(text)
        print("SCALE.md updated")


if __name__ == "__main__":
    main()

"""Round-5 additions: semantic pins for the composed IVF-ADC search, the
IVF nprobe recall audit, BPE encoding, DSIR selection and the SQL pipe
surface — properties the oracle hash can't express (monotonicity, set
relations between queries, equivalence to the classic API)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_streaming_datapipeline_spark.plans.registry import get_query
from e_commerce_streaming_datapipeline_spark.sources.batch import load_table


def _rows(name: str, spark, sf_dir):
    return get_query(name).builder(spark, sf_dir).collect()


def test_ivf_probe_recall_is_monotone(spark, sf_dir):
    """More probes can only ADD candidate clusters, so candidate recall
    must be non-decreasing in nprobe, and n_true is the fixed brute-force
    top-3 pair count for all levels."""
    rows = sorted(_rows("ivf_probe_recall_audit", spark, sf_dir),
                  key=lambda r: r["nprobe"])
    assert [r["nprobe"] for r in rows] == [1, 2, 4]
    assert len({r["n_true"] for r in rows}) == 1
    hits = [r["n_hit"] for r in rows]
    assert hits == sorted(hits), "recall must be monotone in nprobe"
    for r in rows:
        assert 0 <= r["n_hit"] <= r["n_true"]


def test_ivf_adc_is_subset_of_probed_clusters(spark, sf_dir):
    """Every IVF-ADC result pair must come from a probed cluster: the
    composed search can never surface a neighbor the IVF tier pruned.
    Verified against the audit's min-probe-level tagging at nprobe=2."""
    from e_commerce_streaming_datapipeline_spark.operators import similarity as sim

    emb = sim.ivf_input(spark, sf_dir)
    a2, cents2 = sim.ivf_train(emb)
    probes = sim.ivf_assign(
        emb.where(F.col("vec_id") < sim.N_QUERIES), cents2, top=sim._IVF_NPROBE
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("c_label").alias("probe_label"),
    )
    allowed = {
        (r["query_id"], r["vec_id"])
        for r in probes.join(
            a2, F.col("probe_label") == F.col("cluster")
        ).collect()
    }
    out = _rows("embedding_topk_ivf_adc", spark, sf_dir)
    assert out, "composed search returned nothing"
    for r in out:
        assert (r["query_id"], r["neighbor_id"]) in allowed
        assert 1 <= r["rank"] <= sim._PQ_TOPK


def test_bpe_encode_census_conserves_tokens(spark, sf_dir):
    """The encode census is internally consistent: 20 rows, non-empty
    tokens, occurrence-sorted, every learned merged token that appears has
    its occurrences bounded by the trainer's pair count for that merge
    (each surviving merged symbol came from one counted pair occurrence)."""
    census = _rows("bpe_encode_tokens", spark, sf_dir)
    assert len(census) == 20
    occ = [r["n_occurrences"] for r in census]
    assert occ == sorted(occ, reverse=True)
    assert all(r["token"] for r in census)
    # two distinct merge rounds can yield the SAME surface token (e.g.
    # 'a'+'bc' and 'ab'+'c' both produce 'abc'); occurrences of that token
    # then come from BOTH merges, so sum the pair counts per surface form
    # instead of letting a dict silently keep only the last one
    merges: dict = {}
    for r in _rows("bpe_learn_merges", spark, sf_dir):
        merges[r["merged"]] = merges.get(r["merged"], 0) + r["pair_count"]
    for r in census:
        if r["token"] in merges:
            assert r["n_occurrences"] <= merges[r["token"]]


def test_dsir_sample_excludes_target_and_sorts(spark, sf_dir):
    """DSIR selects from the RAW pool only (target-source docs are already
    in-distribution) and returns weight-descending rows."""
    from e_commerce_streaming_datapipeline_spark.operators.curation import (
        _DSIR_TARGET_SOURCE,
        _DSIR_TOPK,
    )

    rows = _rows("dsir_importance_sample", spark, sf_dir)
    assert len(rows) == _DSIR_TOPK
    weights = [r["importance_weight"] for r in rows]
    assert weights == sorted(weights, reverse=True)
    target_ids = {
        r["doc_id"]
        for r in load_table(spark, "documents", sf_dir)
        .where(F.col("source").eqNullSafe(F.lit(_DSIR_TARGET_SOURCE)))
        .select("doc_id")
        .collect()
    }
    assert not target_ids & {r["doc_id"] for r in rows}


def test_pipe_syntax_matches_classic_dataframe(spark, sf_dir):
    """The |> chain must be plan-equivalent to the classic API: identical
    rows from the groupBy formulation of the same rollup."""
    pipe = {
        (r["o_orderstatus"], r["o_orderpriority"]): (r["n_orders"], r["revenue"])
        for r in _rows("pipe_syntax_revenue", spark, sf_dir)
    }
    classic = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_totalprice").isNotNull())
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast(
                    "double"
                )
                / 100
            ).alias("revenue"),
        )
        .collect()
    )
    assert pipe == {
        (r["o_orderstatus"], r["o_orderpriority"]): (r["n_orders"], r["revenue"])
        for r in classic
    }

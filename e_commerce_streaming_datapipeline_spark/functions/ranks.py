"""Distributed global ranking without a single-partition sort.

``row_number().over(Window.orderBy(...))`` — a global rank with no
PARTITION BY — forces every row through one ``Exchange SinglePartition``
and one task's sort: fine on 60k rows, fatal on a corpus-proportional
relation at 100 TB (a web-scale vocabulary is 10^8-10^9 terms; converted
users are user-proportional).  This module provides the classic two-phase
decomposition used by every distributed sort-rank (TeraSort-style):

1. **Range-repartition** on the sort key, so partition *i* holds only keys
   ordered before partition *i+1*'s (Spark's ``repartitionByRange`` — the
   same sampled range partitioner behind global ``orderBy``), and capture
   ``spark_partition_id()`` as ``__rank_pid``.
2. **Local rank** per partition: ``row_number() OVER (PARTITION BY
   __rank_pid ORDER BY ...)`` — a parallel, spill-safe per-partition sort.
3. **Offsets**: per-partition row counts (``max(local rank)`` — reuses the
   ranked lineage, and the range Exchange is reused by Spark's
   ReuseExchange so the expensive shuffle runs once) form a
   #partitions-row relation; a prefix-sum window over it (bounded by
   ``spark.sql.shuffle.partitions``, NOT by data size) yields each
   partition's global offset.  Global rank = offset + local rank, attached
   by a broadcast join on ``__rank_pid``.

The only single-partition Window left in the plan sorts the bounded
``__rank_pid`` relation — the plan lint (``plans/lint.py``) recognizes the
column name as the documented carve-out, so any NEW unpartitioned window
over real data still fails the registry-wide lint.

Equivalent SQL semantics: ``row_number() OVER (ORDER BY <keys>)`` for a
total order; under ties the assignment of consecutive ranks among equal
keys is arbitrary on both engines (standard row_number nondeterminism).

Measured crossover (``scripts/rank_crossover_probe.py``; SCALE.md
"Two-phase rank crossover", re-measured round 6 with the persist fix
below): the naive global window wins below ~1M rows on local[32] (0.29 s
vs 0.41 s at 100k — pure job-count overhead), loses 3.2× at 6M rows
(9.34 s, of which 9.06 s is ONE task's sort, vs 2.96 s with a 32-task
longest stage), and diverges linearly beyond that.  Do NOT "optimize"
callers back to the global window for small fixtures.

**Why the ranked relation is persisted (round-6 correctness fix).**  The
offsets branch and the final-join branch both read the range-shuffled
relation.  Spark does NOT reuse that exchange between them: join-side
attribute deduplication re-aliases one branch, canonicalized-plan equality
fails, and the executed plan carries TWO physically independent
``Exchange rangepartitioning`` nodes per rank (verified: the
``zorder_layout_stats`` plan showed 4 range exchanges, 0 ``ReusedExchange``).
Each instance samples its own range boundaries (``RangePartitioner``
seeds vary with RDD id), so the boundaries backing the COUNTS can differ
from the boundaries backing the LOCAL RANKS — rows near a disputed
boundary then get offset by the wrong partition census, corrupting a few
global ranks.  That is environment-dependent (input splits, parallelism,
session history) and was the driver-only ``zorder_layout_stats`` hash
mismatch in rounds 4-5 (rows/schema matched; a boundary row moved one
file and shifted the span averages).  ``persist(MEMORY_AND_DISK)`` on the
ranked relation pins ONE materialized partitioning that both branches
scan (``InMemoryTableScan`` ×2, range exchange ×1), making the rank
deterministic by construction.  Eviction under memory pressure is safe:
recompute re-reads the SAME shuffle dependency (the partitioner object is
fixed in the RDD DAG), it never re-samples.  At 100 TB this is the
documented cost of an EXACT global rank — one disk-backed materialization
of the relation, the same order of bytes the range shuffle itself already
wrote; the sketch-based alternative for rank-tolerant consumers is
``approx_value_percentiles`` (GK).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

RANK_PID = "__rank_pid"
_LOCAL_RN = "__rank_local_rn"
_OFFSET = "__rank_offset"

# Every persist() below is registered here so harnesses can release the
# blocks once the consuming action has run.  Without this, each
# global_row_number call (2x per hilbert/zorder query, plus the simjoin and
# percentile family) pins a full copy of its input in the session
# CacheManager for the session's lifetime — across a 326-query suite and 4x
# bench invocations that accumulates unbounded storage, a real leak at the
# 100 TB framing (r6 ADVICE finding #2).  The cache must stay alive until
# the caller's ACTION has executed (the persist pins the one materialized
# range partitioning both plan branches scan — see module docstring), so
# release points are between queries: bench.py releases after each timed
# run, tests/oracle_compare.py after each compare.  A driver session that
# never calls release is bounded by its 50-query window.
_LIVE_RANK_CACHES: list[DataFrame] = []


def register_cache(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame in the shared release list
    (same lifecycle as the rank caches: alive until the consuming action
    has run, dropped by the harnesses' ``release_rank_caches`` between
    queries).  For operators whose plan fans out over one expensive
    relation (e.g. the simjoin's token-id sets, read by three branches)."""
    _LIVE_RANK_CACHES.append(df)
    return df


def release_rank_caches(blocking: bool = False) -> int:
    """Unpersist every rank cache registered since the last release.

    Safe to call only once every consuming action is FINAL (results
    collected and no re-execution of the same DataFrame planned):
    unpersisting removes the InMemoryRelation, so a plan re-executed after
    release re-plans its range exchanges and may re-SAMPLE partition
    boundaries — the two plan branches the persist exists to pin can then
    disagree on boundary rows, exactly the nondeterminism the cache
    prevents (r7 ADVICE #3 corrected the earlier claim that the partitioner
    stays fixed in the RDD DAG).  Harnesses therefore release BETWEEN
    queries, never between actions of one query.  Returns the number of
    caches released."""
    n = len(_LIVE_RANK_CACHES)
    for df in _LIVE_RANK_CACHES:
        try:
            df.unpersist(blocking=blocking)
        except Exception:
            pass  # session already stopped
    _LIVE_RANK_CACHES.clear()
    return n


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "r",
    *,
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a global ``row_number() OVER (ORDER BY *order_by)`` column
    computed with the two-phase distributed rank (module docstring).

    ``order_by`` — sort-key Columns, directions included (``.desc()`` etc.).
    ``total_col`` — also append the total row count (computed from the same
    bounded offsets relation, replacing the ``count(*) OVER ()`` global
    window the naive formulation needs).
    ``num_partitions`` — range partitions for phase 1 (default: the
    session's ``spark.sql.shuffle.partitions``).
    """
    ranged = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    ).withColumn(RANK_PID, F.spark_partition_id())
    local = ranged.withColumn(
        _LOCAL_RN,
        F.row_number().over(Window.partitionBy(RANK_PID).orderBy(*order_by)),
    )
    # pin ONE materialized range partitioning for BOTH consumers (offsets
    # branch + final join) — without this the two branches each run their
    # own independently-sampled range exchange and can disagree on boundary
    # rows (module docstring, "Why the ranked relation is persisted")
    local = local.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE_RANK_CACHES.append(local)
    # #partitions-row relation; its prefix-sum window is bounded by the
    # shuffle-partition count, independent of |df|
    counts = local.groupBy(RANK_PID).agg(F.max(_LOCAL_RN).alias("__rank_cnt"))
    bounded_w = Window.orderBy(RANK_PID).rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = counts.select(
        RANK_PID,
        F.coalesce(F.sum("__rank_cnt").over(bounded_w), F.lit(0)).alias(_OFFSET),
        *(
            [
                F.sum("__rank_cnt")
                .over(
                    Window.orderBy(RANK_PID).rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                )
                .alias(total_col)
            ]
            if total_col
            else []
        ),
    )
    out = (
        local.join(F.broadcast(offsets), RANK_PID)
        .withColumn(rank_col, F.col(_OFFSET) + F.col(_LOCAL_RN))
        .drop(RANK_PID, _LOCAL_RN, _OFFSET)
    )
    return out


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer division for non-negative longs (no double rounding:
    the numerator is made an exact multiple first)."""
    return ((a - (a % b)) / b).cast("long")


def ntile_from_rank(rank: Column, total: Column, k: int) -> Column:
    """SQL ``NTILE(k)`` reconstructed from a global rank and the total row
    count — the distributed replacement for ``ntile(k) OVER (ORDER BY ...)``
    (pair with :func:`global_row_number` and its ``total_col``).

    Standard NTILE fill: with ``n = total`` rows, the first ``n % k``
    buckets hold ``ceil(n/k)`` rows, the rest ``floor(n/k)`` — identical
    assignment to every SQL engine's NTILE over the same total order."""
    n, r = total.cast("long"), rank.cast("long")
    base = _idiv(n, F.lit(k))  # floor(n/k) rows in the small buckets
    m = n % k  # number of big (base+1-row) buckets
    big = base + 1
    cut = m * big  # rows covered by the big buckets
    return (
        F.when(r <= cut, _idiv(r - 1, big))
        .otherwise(m + _idiv(r - cut - 1, base))
        + 1
    ).cast("int")

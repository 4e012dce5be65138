"""Sinks — reference operators K1-K4 (src/sinks/metrics_sink.py:18-51)
rebuilt with real exactly-once semantics.

The reference's sink is append + swallow-duplicate-key-errors
(metrics_sink.py:30-41, relying on Postgres UNIQUE constraints), and it
executes the batch plan up to four times (isEmpty/count/show/write —
SURVEY §4 inefficiency 3).  Here:

* ``idempotent_parquet_sink`` — foreachBatch writer that MERGE-semantically
  replaces window partitions (dynamic partition overwrite keyed on
  window_start date), so re-emitted windows after a failure/restart converge
  instead of duplicating: at-least-once delivery + idempotent write =
  exactly-once table state.
* The batch DataFrame is persisted once per batch; every downstream action
  (metrics, write) reuses it.
* ``jdbc_upsert_sink`` — the JDBC twin: same keying, staged through a
  per-batch table + ON CONFLICT merge executed over a driver-side JDBC
  connection.  Connectivity-gated before any write (no Postgres in this
  container); statement generation is unit-tested either way.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_parquet_sink(output_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: dynamic-partition-overwrite parquet writer.

    Partitioning by window date means a re-processed micro-batch overwrites
    exactly the partitions it touches — the MERGE-on-(window, key) semantics
    SURVEY §2.5 D5 calls for, without a transactional store.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.persist()
        try:
            if batch.isEmpty():
                return
            (
                batch.withColumn("window_date", F.to_date(F.col("window_start")))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("window_date")
                .parquet(output_dir)
            )
        finally:
            batch.unpersist()

    return write


def console_sink(num_rows: int = 5) -> Callable[[DataFrame, int], None]:
    """K2: console monitor (metrics_sink.py:24-26)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.show(num_rows, truncate=False)

    return write


def build_upsert_statement(
    table: str, staging: str, columns: list[str], key_columns: list[str]
) -> str:
    """The INSERT .. ON CONFLICT DO UPDATE merge the JDBC sink executes after
    staging a micro-batch — factored out so the statement generation is unit
    tested even where no database exists (reference target:
    init_metrics.sql's UNIQUE-keyed metric tables)."""
    cols = ", ".join(columns)
    update = ", ".join(f"{c} = EXCLUDED.{c}" for c in columns if c not in key_columns)
    return (
        f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging} "
        f"ON CONFLICT ({', '.join(key_columns)}) DO UPDATE SET {update}"
    )


def jdbc_upsert_sink(
    url: str,
    table: str,
    key_columns: list[str],
    properties: dict[str, str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """K1 twin for JDBC targets: stage the batch into a per-batch table, then
    MERGE on the window/key columns via a driver-side JDBC connection —
    replaces the reference's append + tolerate-duplicate-key
    (metrics_sink.py:30-41) with an idempotent upsert (at-least-once replay
    converges, SURVEY §2.5 D5).

    Connectivity-gated UP FRONT: if no JDBC driver on the classpath accepts
    ``url`` (the case in this container — no Postgres), the sink raises
    before staging anything, so no write is ever attempted against an
    unreachable target.  Statement generation (``build_upsert_statement``)
    is covered by tests/test_streaming.py regardless."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        staging = f"{table}_staging_{batch_id}"
        merge_sql = build_upsert_statement(table, staging, batch_df.columns, key_columns)
        jvm = batch_df.sparkSession._jvm
        try:
            jvm.java.sql.DriverManager.getDriver(url)
        except Exception as exc:  # no registered driver accepts this URL
            raise NotImplementedError(
                f"no JDBC driver on the classpath accepts {url!r}; refusing to "
                f"stage batch {batch_id}. Generated merge statement: {merge_sql}"
            ) from exc
        props = dict(properties or {})
        batch_df.write.jdbc(url, staging, mode="overwrite", properties=props)
        jprops = jvm.java.util.Properties()
        for k, v in props.items():
            jprops.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
        try:
            st = conn.createStatement()
            st.execute(merge_sql)
            st.execute(f"DROP TABLE {staging}")
            st.close()
        finally:
            conn.close()

    return write


def fan_out_sink(*sinks: Callable[[DataFrame, int], None]) -> Callable[[DataFrame, int], None]:
    """Compose several per-batch writers over ONE persisted batch — fixes the
    reference's replay-the-plan-per-action sink (SURVEY §4 inefficiency 3)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.persist()
        try:
            for sink in sinks:
                sink(batch, batch_id)
        finally:
            batch.unpersist()

    return write

"""Structured Streaming operators over the events table (SURVEY.md §2.C ⊕).

The reference is batch-only; the engine adds the streaming surface the
north star requires: windowed aggregation with watermarks, session
windows, and a custom stateful operator.  Each streaming query here reads
the same events parquet through ``readStream`` (file source), processes
it with ``trigger(availableNow=True)`` into an in-memory sink, and
returns the final result as a batch DataFrame -- so the driver's DuckDB
oracle can check streaming results exactly against their batch twins in
operators/windows.py.

Scale notes: file-source streaming at 100 TB reads incrementally
(maxFilesPerTrigger), state lives in the state store keyed by
(window/user), and watermarks bound state size; ``complete`` output mode
is used here only because the harness wants the full final table.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.functions.confscope import stream_session
from eecs485_p4_mapreduce_spark.functions.numeric import dsum, dsum_sql
from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table
from eecs485_p4_mapreduce_spark.sources.tables import normalize_events_ts


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet, with the same ts normalization
    the batch reader applies (sources/tables.py:normalize_events_ts).

    Built on the session's STREAMING CHILD session (confscope.
    stream_session): all streaming conf — reader legacy/timezone here,
    state-partition width in run_to_completion, state-store provider in
    the TWS queries — lands on an isolated SQLConf that no concurrently
    submitted batch query can inherit."""
    spark = stream_session(spark)
    # Harmless for timestamp[us] files; required if ts is TIMESTAMP(NANOS).
    # Must be set BEFORE any schema read of the file.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file source monitors a *directory*; select just the events file.
    raw = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1000")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events_ts(raw)


def run_to_completion(
    stream_df: DataFrame,
    *,
    mode: str = "complete",
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a streaming aggregation to completion (availableNow) into a
    memory sink; return the final table as a batch DataFrame.

    State-partition sizing: a stateful streaming query fixes its state
    partition count from ``spark.sql.shuffle.partitions`` at START and
    pays per-partition state-store commit overhead EVERY microbatch --
    at local test scale 32 partitions is pure overhead (measured:
    stream-stream outer join 5.6s -> 3.0s, chained agg+join 8.2s ->
    3.5s at 8 partitions).  At cluster scale this knob goes UP with the
    key cardinality; SPARK_GRAFT_STREAM_SHUFFLE overrides.  The batch
    conf is restored afterward, and results are partition-count
    invariant (hash state partitioning only shards keys).

    ``state_partitions`` is the per-query width for queries whose state
    layout multiplies the per-partition commit cost (a stream-stream
    join store commits FOUR sub-stores per partition per batch, so its
    file count is 4 x width x batches) — the operator env var still
    wins, so one cluster-side setting scales every query together."""
    import os

    name = f"sg_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="spark-graft-ckpt-")
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    width = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE")
    if width is None:
        width = str(state_partitions) if state_partitions is not None else "8"
    spark.conf.set("spark.sql.shuffle.partitions", width)
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


@query(
    "streaming_tumbling_1h",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h tumbling window aggregation as a real stream (watermarked).

    Same oracle as the batch twin ``tumbling_window_1h``: over bounded
    input, complete-mode streaming aggregation must equal the batch
    aggregate -- this query *is* that equivalence check.
    """
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    return run_to_completion(agg)


@query(
    "streaming_session_30m",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events, {dsum_sql('value')} AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def streaming_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming session windows (30m gap) via ``session_window``.

    The oracle is the independent lag+cumsum sessionization from the batch
    twin -- two different algorithms, same sessions.  session_window's end
    is last-event + gap, so subtract the gap to recover max(ts).
    """
    ev = events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            (F.col("w.end") - F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    return run_to_completion(agg)


@query(
    "streaming_stateful_user_stats",
    oracle=f"""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(value) AS max_value, {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (count, max, decimal-exact sum) kept in explicit
    GroupState across micro-batches, emitted on stream end.

    Grouping is by SHARD (user_id mod 64), not by user: one GroupState per
    shard holds the per-user stats as parallel arrays.  With per-user
    groups the operator paid one Python/Arrow round-trip per user per
    micro-batch (~40 s at sf0.1 -- the round-1 verdict's slowest op);
    64 shard groups amortize that to 64 round-trips while per-user
    update stays vectorized pandas.  State per shard is O(|users|/64);
    shard count is just a constant to raise with the cluster.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    _NSHARDS = 64

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("max_value", DoubleType()),
            StructField("total_value", DoubleType()),
        ]
    )
    # parallel arrays keyed by position: user ids, counts, maxima, and the
    # decimal-exact running sums in micro-units (value * 1e6 as integer)
    # so emission matches the oracle's decimal sum
    state_schema = StructType(
        [
            StructField("uids", ArrayType(LongType())),
            StructField("ns", ArrayType(LongType())),
            StructField("mxs", ArrayType(DoubleType())),
            StructField("sum_micros", ArrayType(LongType())),
        ]
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            uids, ns, mxs, sums = state.get
            acc = pd.DataFrame(
                {"n": ns, "mx": mxs, "sm": sums},
                index=pd.Index(uids, name="user_id"),
            )
        else:
            acc = pd.DataFrame(
                {
                    "n": pd.Series(dtype="int64"),
                    "mx": pd.Series(dtype="float64"),
                    "sm": pd.Series(dtype="int64"),
                },
                index=pd.Index([], name="user_id", dtype="int64"),
            )
        for pdf in pdfs:
            if not len(pdf):
                continue
            micro = np.rint(pdf["value"].to_numpy(dtype="float64") * 1e6).astype("int64")
            g = pdf.assign(sm=micro).groupby("user_id")
            batch = pd.DataFrame(
                {"n": g.size(), "mx": g["value"].max(), "sm": g["sm"].sum()}
            )
            # reindex(fill_value=0) keeps int64 -- no NaN/float64 detour,
            # so the micro-unit sums stay integer-exact while accumulating
            idx = acc.index.union(batch.index)
            an, bn = (s["n"].reindex(idx, fill_value=0) for s in (acc, batch))
            asm, bsm = (s["sm"].reindex(idx, fill_value=0) for s in (acc, batch))
            mx = pd.concat(
                [acc["mx"].reindex(idx), batch["mx"].reindex(idx)], axis=1
            ).max(axis=1)
            acc = pd.DataFrame(
                {"n": an + bn, "mx": mx, "sm": asm + bsm}, index=idx
            )
        acc = acc.sort_index()
        state.update(
            (
                [int(u) for u in acc.index],
                [int(v) for v in acc["n"]],
                [float(v) for v in acc["mx"]],
                [int(v) for v in acc["sm"]],
            )
        )
        yield pd.DataFrame(
            {
                "user_id": acc.index.to_numpy(dtype="int64"),
                "n_events": acc["n"].to_numpy(dtype="int64"),
                "max_value": acc["mx"].to_numpy(dtype="float64"),
                "total_value": acc["sm"].to_numpy(dtype="int64") / 1_000_000,
            }
        )

    ev = events_stream(spark, sf_dir).withColumn(
        "shard", F.pmod(F.col("user_id"), F.lit(_NSHARDS))
    )
    stats = ev.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # update-mode memory sink keeps every emission; the last per user wins.
    result = run_to_completion(stats, mode="update")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        result.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "n_events", "max_value", "total_value")
    )


@query(
    "streaming_join_purchase_click",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
           p.ts AS purchase_ts, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    """,
)
def streaming_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: purchases joined to clicks by the same
    user within the preceding hour, both sides watermarked.

    The watermark + time-range condition bound the join state (clicks
    older than purchase-watermark - 1h are evicted) -- the only way a
    stream-stream join survives unbounded input.  Over bounded input the
    result equals the batch interval join, which is the oracle.
    """
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") < F.col("purchase_ts")),
        "inner",
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts")
    # stream-stream join state commits four sub-stores per partition
    # per batch - width 2 quarters the commit-file count at bench
    # scale (measured 3.6 -> 2.5 s full outer, 4.9 -> 3.8 s chained);
    # SPARK_GRAFT_STREAM_SHUFFLE scales it back up on a cluster
    return run_to_completion(joined, mode="append", state_partitions=2)


@query(
    "streaming_dedup_keys",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates: emit each (user, event_type) key once
    across the whole stream.

    State is O(distinct keys) and is NOT watermark-bounded: Spark only
    evicts dropDuplicates state when the event-time column is part of
    the dedup subset (or with ``dropDuplicatesWithinWatermark``), and
    either variant would re-emit keys recurring after the gap, breaking
    the exact DISTINCT semantics this query promises.  At 100 TB that is
    the real trade: exact forever-dedup pays state per key (fine for
    bounded key domains like this one); time-scoped dedup is the
    watermarked variant with different semantics.

    Only the key columns are output -- which row of a duplicate group
    survives is processing-order-dependent and so unsuitable for an
    oracle, but the surviving key set is exact."""
    ev = events_stream(spark, sf_dir)
    dedup = ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return run_to_completion(dedup, mode="append")


def make_merge_upsert(tgt_base: str, state: dict):
    """The ``foreachBatch`` MERGE ``streaming_upsert_foreachbatch`` runs
    (factored module-level so the failure-injection test drives the real
    merge, not a replica).  IDEMPOTENT under batch replay: the merge
    source is DERIVED FROM ``batch_id`` — snapshot ``v{batch_id-1}`` —
    never from mutable driver state, and the output is an overwrite of
    ``v{batch_id}``, a deterministic function of (previous snapshot,
    batch rows).  A batch replayed after a crash BETWEEN the sink write
    and the checkpoint commit therefore rewrites the identical snapshot
    instead of double-merging it into its own output — the contract
    Delta's ``MERGE INTO`` sink gives and any hand-rolled foreachBatch
    sink must reproduce.  ``state['dir']`` tracks the newest snapshot
    for the caller's final read only.

    PORTABILITY NOTE: the previous-snapshot probe is a driver-local
    ``os.path.exists`` — correct for this query's local-FS tempdir
    target, WRONG verbatim for HDFS/S3 sink paths.  Copying this
    template to a distributed filesystem means replacing the probe with
    the Hadoop FileSystem API
    (``jvm.org.apache.hadoop.fs.Path(prev)`` via
    ``FileSystem.get(...).exists``) or a try-read of ``v{batch_id-1}``;
    the batch-id-derived source and overwrite sink — the idempotency
    contract — carry over unchanged."""
    import os

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        agg = batch_df.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("total_dec"),
            F.max("ts").alias("last_ts"),
        )
        prev = f"{tgt_base}/v{batch_id - 1}"
        if batch_id > 0 and os.path.exists(f"{prev}/_SUCCESS"):
            cur = batch_df.sparkSession.read.parquet(prev)
            zero = F.lit(0).cast("decimal(18,6)")
            merged = cur.alias("t").join(agg.alias("s"), "user_id", "full_outer")
            agg = merged.select(
                F.col("user_id"),
                (
                    F.coalesce(F.col("t.n_events"), F.lit(0))
                    + F.coalesce(F.col("s.n_events"), F.lit(0))
                ).alias("n_events"),
                (
                    F.coalesce(F.col("t.total_dec"), zero)
                    + F.coalesce(F.col("s.total_dec"), zero)
                )
                .cast("decimal(18,6)")
                .alias("total_dec"),
                F.greatest(F.col("t.last_ts"), F.col("s.last_ts")).alias("last_ts"),
            )
        new_dir = f"{tgt_base}/v{batch_id}"
        agg.write.mode("overwrite").parquet(new_dir)
        state["dir"] = new_dir

    return upsert



@query(
    "streaming_upsert_foreachbatch",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_events, {dsum_sql('value')} AS total_value,
           MAX(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def streaming_upsert_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE/upsert via ``foreachBatch``: events arrive in
    multiple micro-batches (the source is re-laid-out into 4 range files,
    ``maxFilesPerTrigger=1``), and each batch full-outer-merges its
    per-user aggregate into a versioned parquet snapshot -- the
    foreachBatch half of what Delta's ``MERGE INTO`` streaming sink does
    (see :func:`make_merge_upsert` for the batch-replay idempotency
    contract, pinned live by the kill-mid-batch test in
    tests/test_streaming_semantics.py).

    Cross-batch accumulation keeps the running sum as decimal(18,6) in
    the snapshot and casts to double only at the end; summing per-batch
    doubles would reintroduce the order-dependence that
    :mod:`..functions.numeric` exists to kill, and the batch order here
    is an accident of file listing.  At 100 TB the snapshot is a
    key-partitioned table and each merge rewrites only the partitions the
    batch touches."""
    spark = stream_session(spark)  # raw readStream below: same child
    src = tempfile.mkdtemp(prefix="spark-graft-upsert-src-")
    load_table(spark, sf_dir, "events").repartitionByRange(4, "ts").write.mode(
        "overwrite"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )

    tgt_base = tempfile.mkdtemp(prefix="spark-graft-upsert-tgt-")
    state: dict[str, str] = {}
    upsert = make_merge_upsert(tgt_base, state)

    ckpt = tempfile.mkdtemp(prefix="spark-graft-ckpt-")
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # exposed for tests: proves the merge really ran incrementally
    streaming_upsert_foreachbatch.last_target_base = tgt_base  # type: ignore[attr-defined]
    return (
        spark.read.parquet(state["dir"])
        .select(
            "user_id",
            "n_events",
            F.col("total_dec").cast("double").alias("total_value"),
            "last_ts",
        )
    )


@query(
    "streaming_sliding_1h_30m",
    oracle=f"""
    SELECT window_start, COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM (
      SELECT unnest([
               date_trunc('hour', ts) + CASE WHEN minute(ts) >= 30
                    THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END,
               date_trunc('hour', ts) + CASE WHEN minute(ts) >= 30
                    THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END
                 - INTERVAL 30 MINUTE
             ]) AS window_start,
             value
      FROM events)
    GROUP BY 1
    """,
)
def streaming_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30m slide) as a real watermarked stream;
    same oracle as the batch twin ``sliding_window_1h_30m`` -- over
    bounded input the incremental overlapping-window aggregation must
    equal the batch answer.  Each event updates exactly two window states;
    the watermark bounds how long a window's partial aggregate is kept."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )
    return run_to_completion(agg)


@query(
    "streaming_join_static_dim",
    oracle=f"""
    SELECT c.c_mktsegment, COUNT(*) AS n_events,
           {dsum_sql('e.value')} AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def streaming_join_static_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the events stream joins the static
    customer dimension (re-read per micro-batch, broadcast at this size)
    and aggregates per market segment.  This is the standard streaming
    enrichment shape -- no state is kept for the join itself (the static
    side is not incremental), only for the downstream aggregate; at
    100 TB the dimension pins in executor memory once per batch while
    the stream side never materializes."""
    spark = stream_session(spark)  # both legs on the streaming child
    ev = events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    agg = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
    )
    return run_to_completion(agg)


@query(
    "streaming_tumbling_append",
    oracle=f"""
    WITH agg AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             COUNT(*) AS n, {dsum_sql('value')} AS total_value
      FROM events
      GROUP BY 1, 2),
    wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events)
    SELECT agg.window_start, agg.event_type, agg.n, agg.total_value
    FROM agg, wm
    WHERE agg.window_start + INTERVAL 1 HOUR <= wm.w
    """,
)
def streaming_tumbling_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same 1h tumbling aggregation in APPEND output mode -- the
    production mode for unbounded streams: a window row is emitted
    exactly once, only after the watermark passes its end (so late data
    can no longer change it), and the sink never rewrites history.

    Over bounded input the final watermark stops at max(event_time) -
    delay, so the trailing windows are (correctly!) never finalized --
    the oracle applies the same cutoff: window_end <= max(ts) - 1h.
    Complete-mode (``streaming_tumbling_1h``) emits those tail windows;
    the difference between the two results IS the append-mode contract.
    """
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    return run_to_completion(agg, mode="append")


def _documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet (file source, same pattern
    as events_stream, including the streaming child session)."""
    spark = stream_session(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1000")
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def _streaming_minhash_oracle() -> str:
    from eecs485_p4_mapreduce_spark.functions.minhashfn import (
        EST_DUCK as _EST_DUCK,
        MINHASH_BANDED_DUCK as _MINHASH_BANDED_DUCK,
        SPLIT as _SPLIT,
    )

    return f"""{_MINHASH_BANDED_DUCK},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_old, b.doc_id AS doc_new,
             a.sig AS sig_a, b.sig AS sig_b
      FROM banded a JOIN banded b
        ON a.b = b.b AND a.band_hash = b.band_hash
           AND a.doc_id < {_SPLIT} AND b.doc_id >= {_SPLIT})
    SELECT doc_old, doc_new, {_EST_DUCK} AS est_jaccard
    FROM cand
    WHERE {_EST_DUCK} >= 0.5
    """


# session-scoped band-index tables already materialized (app, sf_dir) ->
# table name; same immutable-sf_dir discipline as dedup._SIG_CACHE
_BAND_INDEX_TABLES: dict[tuple, str] = {}


def _band_index_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORED banded signature index the streaming probe joins
    against: corpus-side (doc_id < SPLIT) bands written ONCE per session
    as a warehouse table bucketed+sorted by the join key (b, band_hash).

    This is the production shape made literal: at 100 TB the static
    side of a stream-static join must not re-shuffle per micro-batch,
    and a bucketed table gives the sort-merge join its clustering for
    free (zero static-side exchange); while the index is measured small
    the planner still broadcasts it — both scales get the right plan
    without a forced hint.  Bucket count is the local stream-state
    width; a cluster deployment sizes it to corpus/bucket-target."""
    import hashlib

    from eecs485_p4_mapreduce_spark.functions.minhashfn import SPLIT as _SPLIT
    from eecs485_p4_mapreduce_spark.operators.dedup import minhash_signatures

    key = (spark.sparkContext.applicationId, sf_dir)
    name = _BAND_INDEX_TABLES.get(key)
    if name is not None:
        # Keep the liveness signal honest for the sibling GC below: a
        # write-once dir's mtime never advances on its own, so a
        # long-lived application re-reading its cached index refreshes
        # the timestamp here — an index is only TTL-stale if its owner
        # has not QUERIED it for the whole TTL, not merely started
        # long ago.
        import os
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        loc = os.path.join(wh, name)
        if os.path.isdir(loc):
            os.utime(loc)
        else:
            # swept out from under us (idle past the TTL on a shared
            # warehouse) — evict and rebuild below instead of returning
            # a table whose files are gone
            _BAND_INDEX_TABLES.pop(key, None)
            name = None
    if name is None:
        # The name mixes in the applicationId: two applications sharing
        # one warehouse dir each own a private index location, so the
        # cleanup below can never delete an index another live
        # application is reading (round-5 advice).  A previous RUN's
        # orphaned location (same app name re-launched, crash leftovers)
        # is swept only when it is NOT a table in this session's catalog.
        import os
        import shutil
        from urllib.parse import urlparse

        app_tag = hashlib.md5(
            spark.sparkContext.applicationId.encode()
        ).hexdigest()[:6]
        dir_tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
        name = f"sg_band_index_{dir_tag}_{app_tag}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        loc = os.path.join(wh, name)
        if os.path.isdir(loc):
            shutil.rmtree(loc)  # orphan: the DROP above removed any
            # catalog entry this application could have had
        # GC sibling orphans from DEAD applications: same corpus tag,
        # different app tag, untouched for > SPARK_GRAFT_INDEX_TTL_H
        # hours (default 72).  "Untouched" means NOT QUERIED: the
        # cache-hit path above utimes the owner's dir on every re-read,
        # so a live application's index stays younger than the TTL as
        # long as it queries at least once per TTL window.  A live app
        # idle on this corpus for the entire TTL can still lose its
        # index; the cache-hit path detects the missing dir and
        # rebuilds, so the cost is one rebuild, never a broken read.
        # Size the TTL above the longest expected idle gap anyway.
        import time

        ttl_s = float(os.environ.get("SPARK_GRAFT_INDEX_TTL_H", "72")) * 3600
        prefix = f"sg_band_index_{dir_tag}_"
        for entry in os.listdir(wh) if os.path.isdir(wh) else []:
            sib = os.path.join(wh, entry)
            if (
                entry.startswith(prefix)
                and entry != name
                and os.path.isdir(sib)
                and time.time() - os.path.getmtime(sib) > ttl_s
            ):
                shutil.rmtree(sib, ignore_errors=True)
        _, banded = minhash_signatures(spark, sf_dir)
        (
            banded.filter(F.col("doc_id") < _SPLIT)
            .select(
                F.col("doc_id").alias("doc_old"),
                F.col("sig").alias("sig_a"),
                "b",
                "band_hash",
            )
            .write.mode("overwrite")
            .bucketBy(8, "b", "band_hash")
            .sortBy("b", "band_hash")
            .saveAsTable(name)
        )
        _BAND_INDEX_TABLES[key] = name
    return spark.table(name)


@query("streaming_minhash_incremental", oracle=_streaming_minhash_oracle())
def streaming_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest dedup: newly arriving documents (doc_id >=
    dedup._SPLIT plays the new batch) are MinHash-signed IN THE STREAM
    and probed against the static corpus's stored band index -- the
    continuous version of ``dedup_incremental_minhash``, sharing its
    oracle, so the driver check IS the streaming==batch equivalence
    proof.

    The stream side uses the stateless one-pass signature fold
    (dedup.MINHASH_SIG_FOLD): a pure projection, so the only stateful
    operator is the final dropDuplicates on the candidate pair -- exactly
    the state a production pipeline would carry (emitted pairs), bounded
    by the duplicate count, not the corpus.  The corpus side IS a
    stored bucketed index here — a warehouse table bucketed+sorted on
    (b, band_hash) written once per session (``_band_index_table``) —
    so at corpus scale each micro-batch's probe join needs NO
    static-side shuffle, and there is no forced broadcast hint
    (test_no_forced_broadcast rationale: the side is per-document,
    corpus-sized at 100 TB; the planner still broadcasts it while its
    measured size is small).
    """
    from eecs485_p4_mapreduce_spark.functions.minhashfn import (
        BANDS as _BANDS,
        EST_SPARK as _EST_SPARK,
        MINHASH_SIG_FOLD,
        SPLIT as _SPLIT,
        band_hash_sql,
    )

    # corpus side: the stored bucketed band index (see helper above)
    corpus = _band_index_table(spark, sf_dir)
    new = (
        _documents_stream(spark, sf_dir)
        .filter(F.col("doc_id") >= _SPLIT)
        # The file stream delivers each parquet file as ONE input
        # partition, so without this the md5-per-shingle fold for the
        # whole micro-batch runs in a single task (measured 205 s at
        # sf0.1 vs ~2 s parallel).  Re-spreading the batch across the
        # cores is the standard right-sizing step after a file trigger;
        # at cluster scale the count tracks batch bytes, not files.
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", F.expr(MINHASH_SIG_FOLD).alias("sig"))
        # Explode a CONSTANT band sequence and key each band from the
        # sig ATTRIBUTE after the Generate barrier — exploding a bands
        # ARRAY here lets InferFiltersFromGenerate push a size(bands)>0
        # guard (with the whole signature fold inlined into it) below
        # the repartition into the one-task scan; see
        # functions/minhashfn.band_hash_sql.
        .select(
            "doc_id", "sig",
            F.explode(F.expr(f"sequence(1, {_BANDS})")).alias("b"),
        )
        .select(
            F.col("doc_id").alias("doc_new"),
            F.col("sig").alias("sig_b"),
            "b",
            F.expr(band_hash_sql()).alias("band_hash"),
        )
    )
    pairs = (
        new.join(corpus, ["b", "band_hash"])
        .withColumn("est_jaccard", F.expr(_EST_SPARK))
        .filter(F.col("est_jaccard") >= 0.5)
        .select("doc_old", "doc_new", "est_jaccard")
        .dropDuplicates(["doc_old", "doc_new"])
    )
    return run_to_completion(pairs, mode="append")


@query(
    "streaming_tws_user_stats",
    oracle=f"""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(value) AS max_value, {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def streaming_tws_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming via ``transformWithStateInPandas`` —
    the Spark 4 arbitrary-state API (SPARK-40434 successor): a
    ``StatefulProcessor`` with an explicit ValueState, the composable
    replacement for ``applyInPandasWithState``.  Same per-user
    (count, max, decimal-exact sum) contract — and the same oracle — as
    ``streaming_stateful_user_stats``, so the two stateful APIs are
    proven equivalent by the driver check itself.

    Keeps the shard-keyed layout (user_id mod 64 → one state row of
    parallel per-user arrays per shard) that amortizes Python/Arrow
    round-trips; see streaming_stateful_user_stats for the measured
    rationale.  TWS requires the RocksDB state store (the 100 TB state
    backend — disk-spilling, changelog-checkpointed); the conf is set
    for the run and restored after.

    Environment gate: TWS's Python state-server protocol needs
    ``google.protobuf``, which a cluster Spark 4 distribution ships but
    this container does not (and installs are off-limits).  Without it
    the query degrades to the semantically-identical
    ``applyInPandasWithState`` operator, so the declared contract — and
    the oracle — hold on any environment; the TWS branch is exercised
    wherever protobuf exists (``tests/test_streaming_semantics.py``
    skip-gates on the import).
    """
    try:
        import google.protobuf  # noqa: F401  (TWS state-server dependency)
    except ImportError:
        return streaming_stateful_user_stats(spark, sf_dir)
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    _NSHARDS = 64

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("max_value", DoubleType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("uids", ArrayType(LongType())),
            StructField("ns", ArrayType(LongType())),
            StructField("mxs", ArrayType(DoubleType())),
            StructField("sum_micros", ArrayType(LongType())),
        ]
    )

    class ShardStats(StatefulProcessor):
        """Per-shard running stats in one ValueState of parallel arrays
        (micro-unit integer sums => decimal-exact emission)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._acc = handle.getValueState("acc", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._acc.exists():
                uids, ns, mxs, sums = self._acc.get()
                acc = pd.DataFrame(
                    {"n": ns, "mx": mxs, "sm": sums},
                    index=pd.Index(uids, name="user_id"),
                )
            else:
                acc = pd.DataFrame(
                    {
                        "n": pd.Series(dtype="int64"),
                        "mx": pd.Series(dtype="float64"),
                        "sm": pd.Series(dtype="int64"),
                    },
                    index=pd.Index([], name="user_id", dtype="int64"),
                )
            for pdf in rows:
                if not len(pdf):
                    continue
                micro = np.rint(
                    pdf["value"].to_numpy(dtype="float64") * 1e6
                ).astype("int64")
                g = pdf.assign(sm=micro).groupby("user_id")
                batch = pd.DataFrame(
                    {"n": g.size(), "mx": g["value"].max(), "sm": g["sm"].sum()}
                )
                idx = acc.index.union(batch.index)
                an, bn = (s["n"].reindex(idx, fill_value=0) for s in (acc, batch))
                asm, bsm = (s["sm"].reindex(idx, fill_value=0) for s in (acc, batch))
                mx = pd.concat(
                    [acc["mx"].reindex(idx), batch["mx"].reindex(idx)], axis=1
                ).max(axis=1)
                acc = pd.DataFrame({"n": an + bn, "mx": mx, "sm": asm + bsm}, index=idx)
            acc = acc.sort_index()
            self._acc.update(
                (
                    [int(u) for u in acc.index],
                    [int(v) for v in acc["n"]],
                    [float(v) for v in acc["mx"]],
                    [int(v) for v in acc["sm"]],
                )
            )
            yield pd.DataFrame(
                {
                    "user_id": acc.index.to_numpy(dtype="int64"),
                    "n_events": acc["n"].to_numpy(dtype="int64"),
                    "max_value": acc["mx"].to_numpy(dtype="float64"),
                    "total_value": acc["sm"].to_numpy(dtype="int64") / 1_000_000,
                }
            )

        def close(self) -> None:
            pass

    # The provider conf must bind the session that STARTS the stream —
    # the streaming child (events_stream builds there).
    spark = stream_session(spark)
    ev = events_stream(spark, sf_dir).withColumn(
        "shard", F.pmod(F.col("user_id"), F.lit(_NSHARDS))
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    default = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stats = ev.groupBy("shard").transformWithStateInPandas(
            ShardStats(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        result = run_to_completion(stats, mode="update")
    finally:
        if default is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, default)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        result.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "n_events", "max_value", "total_value")
    )


@query(
    "streaming_topk_event_types",
    oracle="""
    WITH wc AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                   ORDER BY n DESC, event_type) AS rank
      FROM wc)
    SELECT window_start, event_type, n, rank FROM rk WHERE rank <= 3
    """,
)
def streaming_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k: the 3 most frequent event types per tumbling
    hour.  The continuous half is the watermarked windowed count — the
    incrementally-maintained state; the rank-and-cut runs on the final
    state table (ranking is not incrementally maintainable under
    retraction in update/complete sinks, so production pipelines do
    exactly this: stream the counts, rank at read time).  Ties break
    deterministically (count desc, then event_type).
    """
    from pyspark.sql import Window

    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    final = run_to_completion(agg)
    w = Window.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
    return (
        final.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("window_start", "event_type", "n", "rank")
    )


@query(
    "streaming_join_left_outer",
    oracle="""
    WITH mx AS (SELECT least(
             max(CASE WHEN event_type = 'click' THEN ts END),
             max(CASE WHEN event_type = 'purchase' THEN ts END))
             - INTERVAL 2 HOUR AS wm
           FROM events),
    p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id AS c_user, ts AS click_ts
          FROM events WHERE event_type = 'click'),
    m AS (SELECT p.purchase_id, c.click_id, p.user_id, p.purchase_ts, c.click_ts
          FROM p JOIN c ON p.user_id = c.c_user
           AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
           AND c.click_ts < p.purchase_ts)
    SELECT purchase_id, click_id, user_id, purchase_ts, click_ts FROM m
    UNION ALL
    SELECT p.purchase_id, CAST(NULL AS BIGINT) AS click_id, p.user_id,
           p.purchase_ts, CAST(NULL AS TIMESTAMP) AS click_ts
    FROM p, mx
    WHERE p.purchase_ts < mx.wm
      AND NOT EXISTS (SELECT 1 FROM m WHERE m.purchase_id = p.purchase_id)
    """,
)
def streaming_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join — the semantics inner joins cannot
    give: purchases with no qualifying click still emit, but only after
    the click-side watermark proves no match can arrive (the null row is
    a STATEMENT about the past, so it must wait for the watermark).

    The oracle encodes the emit contract exactly: matched rows are the
    batch interval join; null-extended rows appear ONLY for purchases
    whose timestamp fell below the final global watermark
    (min(max click_ts, max purchase_ts) - 2h) — purchases younger than
    the watermark are still open state when the bounded input ends and
    are correctly NOT emitted.  Spark's final no-data microbatch under
    availableNow performs that eviction; the driver check therefore
    proves the eviction semantics, not just the join."""
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") < F.col("purchase_ts")),
        "leftOuter",
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts")
    # stream-stream join state commits four sub-stores per partition
    # per batch - width 2 quarters the commit-file count at bench
    # scale (measured 3.6 -> 2.5 s full outer, 4.9 -> 3.8 s chained);
    # SPARK_GRAFT_STREAM_SHUFFLE scales it back up on a cluster
    return run_to_completion(joined, mode="append", state_partitions=2)


@query(
    "streaming_join_full_outer",
    oracle="""
    WITH mx AS (SELECT least(
             max(CASE WHEN event_type = 'click' THEN ts END),
             max(CASE WHEN event_type = 'purchase' THEN ts END))
             - INTERVAL 2 HOUR AS wm
           FROM events),
    p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id AS c_user, ts AS click_ts
          FROM events WHERE event_type = 'click'),
    m AS (SELECT p.purchase_id, c.click_id, p.user_id, p.purchase_ts, c.click_ts
          FROM p JOIN c ON p.user_id = c.c_user
           AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
           AND c.click_ts < p.purchase_ts)
    SELECT purchase_id, click_id, user_id, purchase_ts, click_ts FROM m
    UNION ALL
    SELECT p.purchase_id, CAST(NULL AS BIGINT) AS click_id, p.user_id,
           p.purchase_ts, CAST(NULL AS TIMESTAMP) AS click_ts
    FROM p, mx
    WHERE p.purchase_ts < mx.wm
      AND NOT EXISTS (SELECT 1 FROM m WHERE m.purchase_id = p.purchase_id)
    UNION ALL
    SELECT CAST(NULL AS BIGINT) AS purchase_id, c.click_id, c.c_user AS user_id,
           CAST(NULL AS TIMESTAMP) AS purchase_ts, c.click_ts
    FROM c, mx
    WHERE c.click_ts + INTERVAL 1 HOUR < mx.wm
      AND NOT EXISTS (SELECT 1 FROM m WHERE m.click_id = c.click_id)
    """,
)
def streaming_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join: BOTH sides emit null-extended rows,
    each gated by its own eviction point — asymmetric because the time
    condition is asymmetric.  A purchase closes when the watermark
    passes purchase_ts (no earlier click can still arrive); a click
    stays joinable until purchases 1h LATER are impossible, so its null
    row waits for watermark > click_ts + 1h.  The oracle encodes both
    cutoffs, proving per-side state-eviction timing, not just join
    correctness."""
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = (
        purchases.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("click_ts") < F.col("purchase_ts")),
            "fullOuter",
        )
        # the join's user_id is null on click-only rows; surface one key
        .select(
            "purchase_id",
            "click_id",
            F.coalesce(F.col("user_id"), F.col("c_user")).alias("user_id"),
            "purchase_ts",
            "click_ts",
        )
    )
    # stream-stream join state commits four sub-stores per partition
    # per batch - width 2 quarters the commit-file count at bench
    # scale (measured 3.6 -> 2.5 s full outer, 4.9 -> 3.8 s chained);
    # SPARK_GRAFT_STREAM_SHUFFLE scales it back up on a cluster
    return run_to_completion(joined, mode="append", state_partitions=2)


@query(
    "streaming_chained_agg_join",
    oracle="""
    WITH wm AS (SELECT least(
             max(CASE WHEN event_type = 'click' THEN ts END),
             max(CASE WHEN event_type = 'purchase' THEN ts END))
             - INTERVAL 2 HOUR AS w
           FROM events),
    ck AS (SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
                  COUNT(*) AS n_clicks
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
    pu AS (SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
                  COUNT(*) AS n_purchases
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT ck.user_id, ck.window_start, ck.n_clicks, pu.n_purchases
    FROM ck JOIN pu ON pu.user_id = ck.user_id
                   AND pu.window_start = ck.window_start
    CROSS JOIN wm
    WHERE ck.window_start + INTERVAL 1 HOUR <= wm.w
    """,
)
def streaming_chained_agg_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful operators in one streaming query (the multiple-
    stateful-operator pipeline Spark 4 permits): two independent
    windowed aggregations — hourly click counts and hourly purchase
    counts per user — stream-stream joined on (user, window), all in
    append mode under one pair of watermarks.

    Each aggregation only emits a window once the watermark finalizes
    it, so the downstream join operates on closed windows; the oracle
    applies the identical cutoff (global watermark = min of the two
    sides' max event time, minus the 2h delay) to the batch twin.  This
    is the continuous-ETL topology — rollup then enrich — as a single
    incremental query with bounded state at every stage."""
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .groupBy(F.col("user_id"), F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_clicks"))
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .groupBy(F.col("user_id").alias("p_user"), F.window("ts", "1 hour").alias("pw"))
        .agg(F.count("*").alias("n_purchases"))
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user")) & (F.col("w") == F.col("pw")),
        "inner",
    ).select(
        "user_id",
        F.col("w.start").alias("window_start"),
        "n_clicks",
        "n_purchases",
    )
    # stream-stream join state commits four sub-stores per partition
    # per batch - width 2 quarters the commit-file count at bench
    # scale (measured 3.6 -> 2.5 s full outer, 4.9 -> 3.8 s chained);
    # SPARK_GRAFT_STREAM_SHUFFLE scales it back up on a cluster
    return run_to_completion(joined, mode="append", state_partitions=2)


@query(
    "streaming_session_append",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged),
    agg AS (
      SELECT user_id, MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 30 MINUTE AS session_end,
             COUNT(*) AS n_events, {dsum_sql('value')} AS total_value
      FROM sessions GROUP BY user_id, session_id),
    wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events)
    SELECT a.user_id, a.session_start, a.session_end, a.n_events, a.total_value
    FROM agg a, wm WHERE a.session_end <= wm.w
    """,
)
def streaming_session_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows in APPEND mode: a session row is emitted exactly
    once, only after the watermark passes its end (last event + the
    30-minute gap) — the emit-once contract downstream consumers need,
    vs ``streaming_session_30m``'s complete-mode final table.  The
    oracle sessionizes in batch and applies the same finalization
    cutoff, so the check proves which sessions were CLOSED at end of
    input, not just their aggregates."""
    s = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.col("user_id"), F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    return run_to_completion(s, mode="append")


@query(
    "streaming_sliding_append",
    oracle=f"""
    WITH assigned AS (
      SELECT unnest([
               date_trunc('hour', ts) + CASE WHEN minute(ts) >= 30
                    THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END,
               date_trunc('hour', ts) + CASE WHEN minute(ts) >= 30
                    THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END
                 - INTERVAL 30 MINUTE
             ]) AS window_start,
             value
      FROM events),
    agg AS (
      SELECT window_start, COUNT(*) AS n, {dsum_sql('value')} AS total_value
      FROM assigned GROUP BY window_start),
    wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events)
    SELECT a.window_start, a.n, a.total_value
    FROM agg a, wm WHERE a.window_start + INTERVAL 1 HOUR <= wm.w
    """,
)
def streaming_sliding_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h length, 30m slide) in APPEND mode — each of
    the two windows an event belongs to emits exactly once, when the
    watermark passes ITS end, so late-window emission order follows
    window end time, not arrival.  Completes the append-mode trio
    (tumbling / session / sliding); same finalization-cutoff oracle
    discipline."""
    s = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )
    return run_to_completion(s, mode="append")


@query(
    "source_state_store_reader",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def source_state_store_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 state-store DATA SOURCE: run a tumbling-count streaming
    aggregation to completion, then read the query's OWN checkpointed
    state back as a DataFrame via ``spark.read.format("statestore")`` --
    the state-debugging/state-migration doorway (inspect hot keys,
    audit state growth, bootstrap a replacement query's initial state).

    No watermark is set, so the state retains every window and must
    equal the full batch aggregation -- which is exactly what the
    DuckDB oracle checks; the memory-sink output is ignored, the
    asserted result comes from the STATE FILES.  At scale the state
    source reads the per-partition state stores in parallel straight
    from the checkpoint filesystem, no running query required."""
    import os

    # Stream start, shuffle-width conf, and statestore read all on the
    # streaming child (the run_to_completion discipline, inlined).
    spark = stream_session(spark)
    ev = events_stream(spark, sf_dir)
    agg = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("*").alias("n")
    )
    name = f"sg_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="spark-graft-statesrc-")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8"),
    )
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    st = spark.read.format("statestore").load(ckpt)
    return st.select(
        F.col("key.window.start").alias("window_start"),
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("n"),
    )


@query(
    "streaming_session_dynamic_gap",
    oracle="""
    WITH g AS (
      SELECT user_id, epoch_us(ts) AS us,
             CASE WHEN event_type = 'purchase' THEN 3600000000
                  ELSE 1800000000 END AS gap
      FROM events),
    r AS (
      SELECT user_id, us, gap,
             max(us + gap) OVER (PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_reach
      FROM g),
    f AS (
      SELECT user_id, us, gap,
             CASE WHEN prev_reach IS NULL OR us >= prev_reach
                  THEN 1 ELSE 0 END AS new_s
      FROM r),
    s AS (
      SELECT user_id, us, gap,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM f)
    SELECT user_id, make_timestamp(min(us)) AS session_start,
           make_timestamp(max(us + gap)) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def streaming_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows as a real STREAM: the per-event gap
    expression (purchase 1h, else 30m) drives state merging inside the
    streaming session-window operator.  Same oracle as the batch twin
    ``session_window_dynamic_gap`` -- over bounded input the streamed
    sessions must equal the batch interval-union, which pins that
    incremental state merge == one-shot merge for variable gaps too."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    gap = (
        F.when(F.col("event_type") == "purchase", F.lit("1 hour"))
        .otherwise(F.lit("30 minutes"))
    )
    agg = (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return run_to_completion(agg)


_AUTO_WM_SQL_LATE = """
      SELECT epoch_us(ts) AS t_us,
             max(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hwm_us,
             event_id
      FROM events
"""


def _auto_wm_lateness_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy measurement frame for ``streaming_auto_watermark_tumbling``:
    per-event lateness (high-water-mark minus event time) with its
    global rank attached.  Both sequential shapes go through the
    partition-offset recipes of ``functions/ranking.py`` — the
    per-type high-water mark via :func:`with_running_max` (PARTITION BY
    event_type alone would push corpus/n_types rows through one task)
    and the p95 rank via :func:`with_global_rank` (an unpartitioned
    ``row_number`` would push the whole corpus through one).  Factored
    out so tests/test_plans.py can pin that every windowspec in the
    measurement plan is ``_pid``-scoped."""
    from eecs485_p4_mapreduce_spark.functions.ranking import (
        with_global_rank,
        with_running_max,
    )

    e = load_table(spark, sf_dir, "events")
    late = with_running_max(
        e.select(
            "event_type", "event_id", F.expr("unix_micros(ts)").alias("t_us")
        ),
        ["event_id"],
        "t_us",
        partition_cols=["event_type"],
    ).select((F.col("_runmax") - F.col("t_us")).alias("late_us"), "event_id")
    return with_global_rank(late, ["late_us", "event_id"])


@query(
    "streaming_auto_watermark_tumbling",
    oracle=f"""
    WITH arr AS ({_AUTO_WM_SQL_LATE}),
    late AS (SELECT hwm_us - t_us AS late_us, event_id FROM arr),
    ranked AS (SELECT late_us,
                      row_number() OVER (ORDER BY late_us, event_id) AS rk,
                      COUNT(*) OVER () AS n
               FROM late),
    delay AS (SELECT CAST(ceil(CAST(MAX(CASE WHEN rk = CAST(ceil(0.95 * n)
                            AS BIGINT) THEN late_us END) AS DOUBLE)
                          / 1000000.0) AS BIGINT) AS d_s
              FROM ranked),
    agg AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             COUNT(*) AS n, {dsum_sql('value')} AS total_value
      FROM events GROUP BY 1, 2),
    wm AS (SELECT (SELECT max(ts) FROM events)
                  - to_microseconds(d.d_s * 1000000) AS w
           FROM delay d)
    SELECT agg.window_start, agg.event_type, CAST(agg.n AS BIGINT) AS n,
           agg.total_value
    FROM agg, wm
    WHERE agg.window_start + INTERVAL 1 HOUR <= wm.w
    """,
)
def streaming_auto_watermark_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-tuned watermark: measure the corpus's p95 arrival lateness
    (the `stats_watermark_lateness` procedure, global, rounded up to
    whole seconds), then run the append-mode tumbling aggregation with
    THAT delay instead of a guessed one -- closing the loop from
    measurement to operator configuration.  Two queries in one: the
    lateness scan is a batch job whose single scalar configures the
    stream.

    The oracle recomputes the identical p95 + ceil in SQL and applies
    the same final-watermark cutoff (window_end <= max(ts) - delay), so
    the check proves both the measurement and the append contract under
    a data-derived delay.  The measurement collects exactly ONE scalar
    to the driver (the delay); the lateness rows are corpus-sized, so
    both the per-type high-water mark and the global p95 rank run on
    the partition-offset recipes (``_auto_wm_lateness_ranked``) — no
    data-sized single-task window anywhere in the measurement plan
    (pinned by tests/test_plans.py).
    """
    ranked = _auto_wm_lateness_ranked(spark, sf_dir)
    delay_s = int(
        ranked.filter(F.col("_rk") == F.ceil(0.95 * F.col("_n")).cast("bigint"))
        .select(F.ceil(F.col("late_us").cast("double") / 1e6).cast("bigint"))
        .collect()[0][0]
    )
    ev = events_stream(spark, sf_dir).withWatermark("ts", f"{delay_s} seconds")
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("bigint").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )
    return run_to_completion(agg, mode="append")


@query(
    "streaming_ohlc_hourly",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           arg_min(round(value, 6),
                   CAST(epoch_us(ts) AS HUGEINT) * 9223372036854775808 + event_id)
             AS open,
           round(MAX(value), 6) AS high,
           round(MIN(value), 6) AS low,
           arg_max(round(value, 6),
                   CAST(epoch_us(ts) AS HUGEINT) * 9223372036854775808 + event_id)
             AS close
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def streaming_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars computed AS A STREAM: the ``resample_ohlc_daily``
    arg-extreme recipe inside a watermarked tumbling window — open and
    close are min_by/max_by over the (ts, event_id) struct total order,
    which are associative partial aggregates, so the streaming state per
    window is one (key, value) pair per extreme, never a buffer of
    events.  The oracle is the batch hourly OHLC over the same rows:
    over bounded input the streaming aggregation must equal the batch
    one — the tumbling-window equivalence check extended from
    count/sum to ORDER-DEPENDENT aggregates."""
    ev = events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).withWatermark("ts", "1 hour")
    key = F.struct("ts", "event_id")
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min_by(F.round("value", 6), key).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.max_by(F.round("value", 6), key).alias("close"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "open",
            "high",
            "low",
            "close",
        )
    )
    return run_to_completion(agg)


_IDLE_GAP_US = 1800 * 1000000
_IDLE_GAP_MS = 1800 * 1000
_IDLE_NSHARDS = 64


def _idle_merge_batch(open_, pdf):
    """Sessionize one micro-batch's per-shard rows against the carried
    open sessions: returns (closed 'gap' rows, updated open dict).
    Intra-batch boundaries come from a vectorized diff over each user's
    sorted event times."""
    import numpy as np

    closed = []
    for u, g in pdf.groupby("user_id"):
        us = np.asarray(g["ts"], dtype="datetime64[us]").astype("int64")
        u = int(u)
        if u in open_ and us[0] - open_[u][1] <= _IDLE_GAP_US:
            st0, lt0, n0 = open_[u]
        else:
            if u in open_:
                s = open_[u]
                closed.append((u, s[0], s[1], s[2], "gap"))
            st0, lt0, n0 = us[0], us[0], 0
        bnd = np.where(np.diff(us) > _IDLE_GAP_US)[0]
        seg_starts = np.concatenate(([0], bnd + 1))
        seg_ends = np.concatenate((bnd, [len(us) - 1]))
        for i, (a, b) in enumerate(zip(seg_starts, seg_ends)):
            if i == 0:
                st, lt, n = st0, int(us[b]), n0 + int(b - a + 1)
            else:
                st, lt, n = int(us[a]), int(us[b]), int(b - a + 1)
            if i < len(seg_starts) - 1:
                closed.append((u, st, lt, n, "gap"))
            else:
                open_[u] = [st, lt, n]
    return closed, open_


def _idle_close_expired(open_, wm_us):
    """Close every open session whose idle timeout has passed the
    watermark; returns (closed 'timeout' rows, surviving open dict).

    STRICT compare: Spark fires an event-time timer only when the
    watermark strictly exceeds the registered expiry (armed at
    floor(lt/1000) + gap_ms), so a session whose expiry lands exactly
    on the watermark millisecond must stay OPEN.  Since wm_us is a
    whole millisecond, ``lt + gap < wm_us`` is exactly
    ``floor((lt + gap)/1000) < wm_ms`` — the same rule the timer
    firing implements — so helper, timer arming, and oracle agree at
    the boundary (round-12 ADVICE)."""
    closed = []
    for u in sorted(open_):
        st, lt, n = open_[u]
        if lt + _IDLE_GAP_US < wm_us:
            closed.append((u, st, lt, n, "timeout"))
            del open_[u]
    return closed, open_


def _idle_emit(rows):
    import numpy as np
    import pandas as pd

    return pd.DataFrame(
        {
            "user_id": np.array([r[0] for r in rows], dtype="int64"),
            "session_start": pd.to_datetime([r[1] for r in rows], unit="us"),
            "session_end": pd.to_datetime([r[2] for r in rows], unit="us"),
            "n_events": np.array([r[3] for r in rows], dtype="int64"),
            "closed_by": [r[4] for r in rows],
        }
    )


def _idle_pack(open_):
    ks = sorted(open_)
    return (
        [int(u) for u in ks],
        [int(open_[u][0]) for u in ks],
        [int(open_[u][1]) for u in ks],
        [int(open_[u][2]) for u in ks],
    )


def _idle_unpack(tup):
    uids, sts, lts, ns = tup
    return {u: [s, l, n] for u, s, l, n in zip(uids, sts, lts, ns)}


@query(
    "streaming_tws_idle_timeout_sessions",
    oracle="""
    WITH mx AS (SELECT max(ts) AS head FROM events),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged),
    agg AS (
      SELECT user_id, sid, MIN(ts) AS session_start, MAX(ts) AS session_end,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM sess GROUP BY 1, 2),
    lasts AS (SELECT user_id, MAX(sid) AS last_sid FROM agg GROUP BY 1)
    SELECT a.user_id, a.session_start, a.session_end, a.n_events,
           CASE WHEN a.sid < l.last_sid THEN 'gap' ELSE 'timeout' END
             AS closed_by
    FROM agg a JOIN lasts l USING (user_id) CROSS JOIN mx
    WHERE a.sid < l.last_sid
       OR epoch_us(a.session_end) + 1800000000
            < (epoch_us(mx.head) // 1000) * 1000
    """,
)
def streaming_tws_idle_timeout_sessions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Idle-timeout sessionization with EVENT-TIME TIMERS — the timer
    half of the arbitrary-state API that the rest of the streaming bank
    doesn't exercise: a session CLOSES either when a later event
    arrives after a >30m gap ('gap', emitted while handling input) or
    when the WATERMARK passes last_event + 30m with no successor
    ('timeout', emitted from the timer callback in the
    watermark-advance batch).  Sessions still open at the corpus-head
    watermark are NOT emitted — exactly the at-rest state a production
    restart would resume.

    The oracle replays both rules in batch SQL: lag+cumsum sessions,
    with a user's LAST session appearing iff session_end + 30m is
    STRICTLY below the head watermark (ms-floored, delay 0 — Spark
    tracks watermarks in milliseconds, and an event-time timer fires
    only when the watermark strictly exceeds its registered expiry,
    so an expiry landing exactly on the final watermark millisecond
    stays open; `_idle_close_expired` uses the same strict rule).  Grouping is by SHARD (user_id mod 64, the
    streaming_stateful_user_stats lesson): one state row and ONE
    armed timer per shard (the earliest open expiry, re-armed as
    sessions close) — per-user keys would pay a Python round-trip per
    user per batch and a million-timer state at scale.  Intra-batch
    gaps split vectorized (numpy diff over per-user sorted times);
    emission is append-mode and exactly-once-at-close.

    Environment gate (the streaming_tws_user_stats precedent): TWS's
    state-server protocol needs google.protobuf, which this container
    lacks — without it the query runs the semantically-identical
    ``applyInPandasWithState`` spelling (GroupStateTimeout.
    EventTimeTimeout + setTimeoutTimestamp, the pre-4.0 timer API);
    the TWS StatefulProcessor branch (registerTimer /
    handleExpiredTimer) runs wherever protobuf exists."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
            StructField("closed_by", StringType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("uids", ArrayType(LongType())),
            StructField("sts", ArrayType(LongType())),
            StructField("lts", ArrayType(LongType())),
            StructField("ns", ArrayType(LongType())),
        ]
    )

    spark = stream_session(spark)
    ev = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "0 seconds")
        .withColumn(
            "shard", F.pmod(F.col("user_id"), F.lit(_IDLE_NSHARDS))
        )
        .select("shard", "user_id", "ts")
    )

    try:
        import google.protobuf  # noqa: F401  (TWS state-server dependency)

        have_tws = True
    except ImportError:
        have_tws = False

    if have_tws:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class IdleSessions(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._h = handle
                self._open = handle.getValueState("open", state_schema)

            def _load(self):
                if self._open.exists():
                    return _idle_unpack(self._open.get())
                return {}

            def _store_and_arm(self, open_):
                self._open.update(_idle_pack(open_))
                for ts in list(self._h.listTimers()):
                    self._h.deleteTimer(ts)
                if open_:
                    earliest = min(v[1] for v in open_.values())
                    self._h.registerTimer(
                        earliest // 1000 + _IDLE_GAP_MS
                    )

            def handleInputRows(self, key, rows, timerValues):
                open_ = self._load()
                closed = []
                parts = [p for p in rows if len(p)]
                if parts:
                    pdf = pd.concat(parts).sort_values(["user_id", "ts"])
                    closed, open_ = _idle_merge_batch(open_, pdf)
                self._store_and_arm(open_)
                if closed:
                    yield _idle_emit(closed)

            def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
                wm_us = timerValues.getCurrentWatermarkInMs() * 1000
                closed, open_ = _idle_close_expired(self._load(), wm_us)
                self._store_and_arm(open_)
                if closed:
                    yield _idle_emit(closed)

            def close(self) -> None:
                pass

        sessions = ev.groupBy("shard").transformWithStateInPandas(
            IdleSessions(),
            outputStructType=out_schema,
            outputMode="Append",
            timeMode="EventTime",
        )
        return run_to_completion(sessions, mode="append")

    # pre-4.0 timer API twin: same semantics through GroupState
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def idle_fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            wm_us = state.getCurrentWatermarkMs() * 1000
            open_ = _idle_unpack(state.get) if state.exists else {}
            closed, open_ = _idle_close_expired(open_, wm_us)
            if open_:
                state.update(_idle_pack(open_))
                earliest = min(v[1] for v in open_.values())
                state.setTimeoutTimestamp(
                    max(
                        earliest // 1000 + _IDLE_GAP_MS,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
            else:
                state.remove()
            if closed:
                yield _idle_emit(closed)
            return
        open_ = _idle_unpack(state.get) if state.exists else {}
        closed = []
        parts = [p for p in pdfs if len(p)]
        if parts:
            pdf = pd.concat(parts).sort_values(["user_id", "ts"])
            closed, open_ = _idle_merge_batch(open_, pdf)
        if open_:
            state.update(_idle_pack(open_))
            earliest = min(v[1] for v in open_.values())
            state.setTimeoutTimestamp(
                max(
                    earliest // 1000 + _IDLE_GAP_MS,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        else:
            state.remove()
        if closed:
            yield _idle_emit(closed)

    sessions = ev.groupBy("shard").applyInPandasWithState(
        idle_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return run_to_completion(sessions, mode="append")

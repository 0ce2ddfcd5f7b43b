"""Tests for incremental ingest (checkpointed availableNow) and streaming
windowed aggregations."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from bankcreditunion_datapipeline_spark.streaming.incremental import (
    Watermark,
    incremental_files,
)
from bankcreditunion_datapipeline_spark.streaming.windows import (
    run_stream_to_memory,
    sessionize,
    windowed_event_counts,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write_events(spark, path, start_id, n):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=7 * i), i % 3, "click" if i % 2 else "view", float(i))
        for i in range(start_id, start_id + n)
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_incremental_files_processes_only_new(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    seen: list[int] = []

    def batch_fn(df, batch_id):
        seen.append(df.count())

    _write_events(spark, src, 0, 10)
    incremental_files(spark, src, ckpt, EVENT_SCHEMA, batch_fn)
    assert sum(seen) == 10

    # second run with 5 new rows: only the delta is processed
    _write_events(spark, src, 100, 5)
    incremental_files(spark, src, ckpt, EVENT_SCHEMA, batch_fn)
    assert sum(seen) == 15


def test_watermark_store(tmp_path):
    wm = Watermark(str(tmp_path / "wm.json"))
    assert wm.get("fdic") is None
    wm.advance("fdic", "2020-03-31")
    assert wm.get("fdic") == "2020-03-31"
    wm.advance("fdic", "2020-06-30")
    try:
        wm.advance("fdic", "2019-12-31")
        raise AssertionError("regression should raise")
    except ValueError:
        pass


def test_watermark_store_hadoop_fs_path(spark, tmp_path):
    """A scheme-qualified URI must route through the Hadoop FileSystem
    (shared-storage cluster contract), with the same monotonicity guard;
    file:// proves the routing against the local FS implementation."""
    import os
    import pytest

    local = tmp_path / "wm_hadoop.json"
    wm = Watermark(f"file://{local}", spark)
    assert wm._hadoop() is not None  # really on the Hadoop route
    assert wm.get("ncua") is None
    wm.advance("ncua", "2021-03-31")
    wm.advance("ncua", "2021-06-30")
    assert wm.get("ncua") == "2021-06-30"
    with pytest.raises(ValueError, match="regress"):
        wm.advance("ncua", "2020-12-31")
    # state is durable at the underlying location and the tmp file is gone
    assert local.exists() and not os.path.exists(str(local) + ".tmp")
    # a fresh store instance (new "driver") reads the same shared state
    assert Watermark(f"file://{local}", spark).get("ncua") == "2021-06-30"


def test_windowed_counts_streaming_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_events(spark, src, 0, 60)  # spans several hours at 7-min spacing
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(src)
    batch = windowed_event_counts(batch_df)

    stream_df = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    run_stream_to_memory(
        windowed_event_counts(stream_df), "win_counts", str(tmp_path / "ckpt2")
    )
    streamed = sorted(map(tuple, spark.sql("SELECT * FROM win_counts").collect()))
    # Append mode emits only windows CLOSED by the watermark (max_ts - delay);
    # the trailing open window is held back -- that's the late-data contract.
    max_ts = batch_df.agg(F.max("ts")).first()[0]
    cutoff = max_ts - datetime.timedelta(minutes=15)
    closed_batch = sorted(
        map(tuple, batch.filter(F.col("window_end") <= cutoff).collect())
    )
    assert streamed == closed_batch
    assert len(streamed) > 0


def test_sessionize_gap_semantics(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "click", 1.0),
        (2, base + datetime.timedelta(minutes=10), 1, "click", 1.0),
        (3, base + datetime.timedelta(hours=2), 1, "click", 1.0),  # new session
        (4, base + datetime.timedelta(minutes=5), 2, "view", 1.0),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    sessions = sessionize(df, gap="30 minutes").collect()
    per_user = {}
    for r in sessions:
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_stateful_cumulative_across_batches(spark, tmp_path):
    from bankcreditunion_datapipeline_spark.streaming.stateful import (
        user_cumulative_totals,
    )

    src = str(tmp_path / "src_state")
    # two separate files -> maxFilesPerTrigger=1 forces two micro-batches,
    # so state must survive a batch boundary to produce the right totals
    _write_events(spark, src, 0, 6)    # users 0,1,2 x 2 events each
    _write_events(spark, src, 100, 6)  # users 0,1,2 x 2 more events (ids 100..105)
    stream_df = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_to_memory(
        user_cumulative_totals(stream_df), "cum_totals", str(tmp_path / "ckpt_state")
    )
    rows = spark.sql("SELECT * FROM cum_totals").collect()
    final = {}
    for r in rows:
        if r.batches_seen == max(x.batches_seen for x in rows if x.user_id == r.user_id):
            final[r.user_id] = r
    # every user appears in both batches -> batches_seen == 2, 4 events each
    assert set(final) == {0, 1, 2}
    for uid, r in final.items():
        assert r.batches_seen == 2
        assert r.n_events == 4
    # user 0 (id % 3 == 0) saw event ids {0,3,102,105} -> total 210 (value == id)
    assert final[0].total_value == 0 + 3 + 102 + 105


def test_dedup_stream_drops_redelivered(spark, tmp_path):
    from bankcreditunion_datapipeline_spark.streaming.windows import dedup_stream

    src = str(tmp_path / "src_dup")
    # batch 1: events 0..9; batch 2: same ids REdelivered + 5 new
    _write_events(spark, src, 0, 10)
    _write_events(spark, src, 0, 10)   # duplicate file content (same ids)
    _write_events(spark, src, 200, 5)
    stream_df = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_to_memory(
        dedup_stream(stream_df, ["event_id"], watermark_delay="10 hours"),
        "dedup_out",
        str(tmp_path / "ckpt_dedup"),
    )
    rows = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids)) == 15  # 10 unique + 5 new, replays dropped


def test_streaming_upsert_latest_wins(spark, tmp_path):
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_upsert,
    )

    src = str(tmp_path / "usrc")
    ckpt = str(tmp_path / "uckpt")
    tgt = str(tmp_path / "utgt")

    # round 1: users 0,1,2 (via user_id=i%3), versions = ts
    _write_events(spark, src, 0, 6)
    streaming_upsert(
        spark, src, ckpt, EVENT_SCHEMA, tgt, keys=["user_id"], version_col="ts"
    )
    cur = spark.read.schema(EVENT_SCHEMA).parquet(tgt + "/current")
    assert cur.count() == 3  # one row per user_id
    # latest event per user wins: user 0 -> event 3? ids 0..5, user=i%3:
    # user 0 has ids 0,3 -> latest 3
    got = {r["user_id"]: r["event_id"] for r in cur.collect()}
    assert got == {0: 3, 1: 4, 2: 5}

    # round 2: only the delta (ids 6..8, newer ts) is read and merged
    _write_events(spark, src, 6, 3)
    streaming_upsert(
        spark, src, ckpt, EVENT_SCHEMA, tgt, keys=["user_id"], version_col="ts"
    )
    cur = spark.read.schema(EVENT_SCHEMA).parquet(tgt + "/current")
    got = {r["user_id"]: r["event_id"] for r in cur.collect()}
    assert got == {0: 6, 1: 7, 2: 8}


def test_sliding_windows_streaming_matches_batch(spark, tmp_path):
    src = str(tmp_path / "slide_src")
    _write_events(spark, src, 0, 60)
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(src)
    batch = windowed_event_counts(batch_df, slide="15 minutes")
    # every event is in exactly duration/slide = 4 windows
    n_events = batch_df.count()
    assert batch.agg(F.sum("n_events")).first()[0] == 4 * n_events

    stream_df = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    run_stream_to_memory(
        windowed_event_counts(stream_df, slide="15 minutes"),
        "slide_counts",
        str(tmp_path / "slide_ckpt"),
    )
    streamed = sorted(map(tuple, spark.sql("SELECT * FROM slide_counts").collect()))
    max_ts = batch_df.agg(F.max("ts")).first()[0]
    cutoff = max_ts - datetime.timedelta(minutes=15)
    closed_batch = sorted(
        map(tuple, batch.filter(F.col("window_end") <= cutoff).collect())
    )
    assert streamed == closed_batch


def test_stream_interval_join_matches_batch(spark, tmp_path):
    from bankcreditunion_datapipeline_spark.streaming.joins import (
        stream_interval_join,
    )

    src = str(tmp_path / "ssj_src")
    _write_events(spark, src, 0, 40)

    def views(df):
        return df.filter(F.col("event_type") == "view").select(
            "user_id", F.col("ts").alias("v_ts"), F.col("event_id").alias("view_id")
        )

    def clicks(df):
        return df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("click_id")
        )

    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(src)
    batch = stream_interval_join(
        views(batch_df), clicks(batch_df), ["user_id"], "v_ts", "c_ts", 1800
    )
    expected = sorted(
        map(tuple, batch.select("user_id", "view_id", "click_id").collect())
    )
    assert expected, "fixture should produce at least one in-window pair"

    stream_df = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    sj = stream_interval_join(
        views(stream_df), clicks(stream_df), ["user_id"], "v_ts", "c_ts", 1800
    )
    run_stream_to_memory(
        sj.select("user_id", "view_id", "click_id"),
        "ssj_pairs",
        str(tmp_path / "ssj_ckpt"),
    )
    got = sorted(map(tuple, spark.sql("SELECT * FROM ssj_pairs").collect()))
    assert got == expected


def test_streaming_cdc_apply_deletes_and_tombstones(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_cdc_apply,
    )

    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("seq", LongType()),
            StructField("val", StringType()),
            StructField("op", StringType()),
        ]
    )
    src = str(tmp_path / "cdc_src")
    ckpt = str(tmp_path / "cdc_ckpt")
    tgt = str(tmp_path / "cdc_tgt")

    def land(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        streaming_cdc_apply(
            spark, src, ckpt, schema, tgt,
            keys=["k"], order_cols=["seq"],
        )

    def live():
        df = spark.read.schema(schema).parquet(tgt + "/current")
        return {r.k: (r.seq, r.val) for r in df.collect()}

    # batch 1: inserts for 1,2,3
    land([(1, 10, "a", "U"), (2, 10, "b", "U"), (3, 10, "c", "U")], "b1")
    run()
    assert live() == {1: (10, "a"), 2: (10, "b"), 3: (10, "c")}

    # batch 2: update 1, delete 2
    land([(1, 20, "a2", "U"), (2, 20, None, "D")], "b2")
    run()
    assert live() == {1: (20, "a2"), 3: (10, "c")}
    # tombstone retained in state
    state = spark.read.schema(schema).parquet(tgt + "/state")
    ops = {r.k: r.op for r in state.collect()}
    assert ops == {1: "U", 2: "D", 3: "U"}

    # batch 3: an OLDER redelivered upsert for the deleted key 2 must NOT
    # resurrect it (the tombstone outranks it), and an older update for 1
    # must lose to the current seq=20 row
    land([(2, 15, "b-old", "U"), (1, 5, "a-old", "U")], "b3")
    run()
    assert live() == {1: (20, "a2"), 3: (10, "c")}


def test_streaming_near_dedup_drops_cross_batch_dups(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_near_dedup,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    tgt = str(tmp_path / "out")
    base = (
        "the quick brown fox jumps over the lazy dog while the calm river "
        "flows past the quiet village in the early morning light"
    )
    near = base.replace("quiet", "sleepy")
    unique1 = "completely different subject matter about spark physical plans and shuffles"
    unique2 = "yet another unrelated document mentioning parquet footers and row groups"

    def run():
        streaming_near_dedup(
            spark, str(src), ckpt, schema, tgt, threshold=0.5
        )

    spark.createDataFrame(
        [(1, base), (2, near), (3, unique1)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    run()
    kept1 = sorted(
        r.doc_id for r in spark.read.parquet(f"{tgt}/clean").collect()
    )
    assert kept1 == [1, 3]  # 2 is an intra-batch near-dup of 1

    # batch 2: 10 near-dups doc 1 ACROSS batches; 11 is fresh
    spark.createDataFrame(
        [(10, base.replace("calm", "wide")), (11, unique2)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    run()
    kept2 = sorted(
        r.doc_id for r in spark.read.parquet(f"{tgt}/clean").collect()
    )
    assert kept2 == [1, 3, 11]  # 10 dropped against the persisted index
    # index holds signatures for every accepted doc, nothing else
    idx_ids = sorted(
        r.doc_id for r in spark.read.parquet(f"{tgt}/index").collect()
    )
    assert idx_ids == [1, 3, 11]


def test_streaming_near_dedup_idempotent_on_redelivery(spark, tmp_path):
    """A redelivered micro-batch (same batch_id after a failure) must
    REPLACE its batch partition, not double-append survivors and index
    signatures -- and must not dedup against its own previous attempt.
    Simulated by wiping the checkpoint so the same files replay as the
    same batch id 0."""
    import shutil

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_near_dedup,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    tgt = str(tmp_path / "out")
    base = (
        "the quick brown fox jumps over the lazy dog while the calm river "
        "flows past the quiet village in the early morning light"
    )
    docs = [(1, base), (2, base.replace("quiet", "sleepy")),
            (3, "unrelated text about parquet footers row groups and codecs")]
    spark.createDataFrame(docs, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    def run():
        streaming_near_dedup(spark, str(src), ckpt, schema, tgt, threshold=0.5)

    run()
    first = sorted(r.doc_id for r in spark.read.parquet(f"{tgt}/clean").collect())
    assert first == [1, 3]
    shutil.rmtree(ckpt)  # forget progress -> same files redeliver as batch 0
    run()
    again = sorted(r.doc_id for r in spark.read.parquet(f"{tgt}/clean").collect())
    assert again == first  # replaced, not doubled; self-dedup didn't fire
    idx = sorted(r.doc_id for r in spark.read.parquet(f"{tgt}/index").collect())
    assert idx == first


def test_storage_path_exists_handles_schemes(spark, tmp_path):
    """The index probe must honor any Hadoop-supported scheme, not just
    bare local paths -- an always-false probe would silently disable
    cross-batch history dedup on object storage."""
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        _storage_path_exists,
    )

    existing = tmp_path / "idx"
    existing.mkdir()
    assert _storage_path_exists(spark, str(existing))
    assert _storage_path_exists(spark, f"file://{existing}")
    assert not _storage_path_exists(spark, str(tmp_path / "nope"))
    assert not _storage_path_exists(spark, f"file://{tmp_path}/nope")


def test_streaming_cdc_state_bounded_at_scale(spark, tmp_path):
    """Replay the sf0.1 events table as a 3-batch CDC stream: the stored
    state must stay O(distinct keys), never O(events) -- each batch
    re-compacts to one row per key, so thousands of changes per key
    collapse. This is the bench-scale twin of the toy equivalence test."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bankcreditunion_datapipeline_spark.sources.files import read_testdata
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_cdc_apply,
    )

    events = read_testdata(spark, "/root/testdata/sf0.1", "events")
    changes = events.select(
        F.col("user_id").cast("long").alias("k"),
        F.unix_micros(F.col("ts")).alias("seq"),
        F.col("event_type").alias("val"),
        # deterministic op mix: purchases are deletes, everything else upserts
        F.when(F.col("event_type") == "purchase", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        # deterministic 3-way batch split, uncorrelated with key or time
        (F.abs(F.xxhash64("user_id", "ts")) % 3).alias("__b"),
    ).persist()
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("seq", LongType()),
            StructField("val", StringType()),
            StructField("op", StringType()),
        ]
    )
    src = str(tmp_path / "cdc_src")
    ckpt = str(tmp_path / "cdc_ckpt")
    tgt = str(tmp_path / "cdc_tgt")

    events_so_far = 0
    keys_so_far: set[int] = set()
    for b in range(3):
        part = changes.filter(F.col("__b") == b).drop("__b")
        part.write.mode("append").parquet(src)
        events_so_far += part.count()
        keys_so_far |= {r.k for r in part.select("k").distinct().collect()}
        streaming_cdc_apply(
            spark, src, ckpt, schema, tgt, keys=["k"], order_cols=["seq"]
        )
        state_rows = spark.read.schema(schema).parquet(tgt + "/state").count()
        # exactly one state row per key ever seen (live or tombstone)
        assert state_rows == len(keys_so_far), (b, state_rows, len(keys_so_far))
    changes.unpersist()
    # the point: state is keys-sized, events are not
    assert events_so_far > 10 * len(keys_so_far), (events_so_far, len(keys_so_far))
    # live table excludes keys whose latest change is a delete
    state = spark.read.schema(schema).parquet(tgt + "/state")
    live = spark.read.schema(schema).parquet(tgt + "/current")
    n_tombstones = state.filter(F.col("op") == "D").count()
    assert live.count() == len(keys_so_far) - n_tombstones


def test_streaming_cdc_tombstone_expiry_bounds_state(spark, tmp_path):
    """tombstone_keep evicts delete markers behind the redelivery horizon:
    the state sheds them (bounded tombstone term) while retaining the
    ones the source could still redeliver behind."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_cdc_apply,
    )

    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("seq", LongType()),
            StructField("val", StringType()),
            StructField("op", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    tgt = str(tmp_path / "tgt")

    def run():
        streaming_cdc_apply(
            spark, src, ckpt, schema, tgt,
            keys=["k"], order_cols=["seq"],
            tombstone_keep="seq >= 100",
        )

    spark.createDataFrame(
        [(1, 10, "a", "U"), (2, 11, "b", "U"), (3, 12, "c", "U")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    # delete 1 BEHIND the horizon (expired), delete 2 within it (kept)
    spark.createDataFrame(
        [(1, 20, None, "D"), (2, 200, None, "D")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    state = {r.k: r.op for r in
             spark.read.schema(schema).parquet(tgt + "/state").collect()}
    assert state == {2: "D", 3: "U"}  # key 1's tombstone evicted
    live = {r.k for r in
            spark.read.schema(schema).parquet(tgt + "/current").collect()}
    assert live == {3}


def test_streaming_drift_monitor_matches_batch(spark, tmp_path):
    """Streamed windowed counts -> psi_terms batch finisher == the same
    pipeline computed fully in batch; identical distributions give PSI 0."""
    from bankcreditunion_datapipeline_spark.operators.drift import (
        drift_alerts,
        psi_terms,
    )

    src = str(tmp_path / "drift_src")
    _write_events(spark, src, 0, 80)
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(src)

    # reference = the overall historical distribution
    ref = batch_df.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_ref")
    )

    stream_df = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    run_stream_to_memory(
        windowed_event_counts(stream_df), "drift_counts", str(tmp_path / "ck")
    )
    streamed_counts = spark.sql(
        "SELECT window_start, event_type, n_events FROM drift_counts"
    )

    max_ts = batch_df.agg(F.max("ts")).first()[0]
    cutoff = max_ts - datetime.timedelta(minutes=15)
    batch_counts = windowed_event_counts(batch_df).filter(
        F.col("window_end") <= cutoff
    ).select("window_start", "event_type", "n_events")

    got = sorted(
        map(
            tuple,
            psi_terms(streamed_counts, ref, ["window_start"]).collect(),
        )
    )
    want = sorted(
        map(tuple, psi_terms(batch_counts, ref, ["window_start"]).collect())
    )
    assert got == want and len(got) > 0

    # alerts fold: psi >= 0 everywhere, deterministic flag
    alerts = {
        r["window_start"]: (r["psi_t"], r["drifted"])
        for r in drift_alerts(
            psi_terms(streamed_counts, ref, ["window_start"]),
            ["window_start"],
        ).collect()
    }
    assert all(p >= 0 for p, _ in alerts.values())

    # a window whose distribution equals the reference proportions with
    # EQUAL counts has p == q for every category -> every term exactly 0
    same = psi_terms(ref.withColumn("w", F.lit(1)).select(
        "w", "event_type", F.col("n_ref").alias("n_events")
    ), ref, ["w"])
    assert all(r["psi_term_t"] == 0.0 for r in same.collect())


def test_psi_terms_scaffolds_missing_categories(spark):
    from bankcreditunion_datapipeline_spark.operators.drift import psi_terms

    ref = spark.createDataFrame(
        [("a", 50), ("b", 30), ("c", 20)], "event_type string, n_ref long"
    )
    # window 1 never saw category c; its absence must still contribute
    obs = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 5), (2, "z", 7)],
        "w int, event_type string, n_events long",
    )
    out = psi_terms(obs, ref, ["w"]).collect()
    rows = {(r["w"], r["event_type"]): r for r in out}
    assert rows[(1, "c")]["n_obs"] == 0
    assert rows[(1, "c")]["psi_term_t"] > 0
    # observed category outside the reference space is ignored
    assert (2, "z") not in rows
    # every group scaffolds to exactly the reference categories
    assert {k[1] for k in rows} == {"a", "b", "c"}


def test_streaming_count_min_matches_batch_and_is_idempotent(spark, tmp_path):
    """The per-batch-partition CM state merged on read must equal the
    one-shot batch sketch of all the data (counters are a sum-monoid),
    its top-k estimates must match batch top-k AND true counts (no
    collisions at this width), and replaying a batch partition must not
    double-count."""
    from bankcreditunion_datapipeline_spark.operators.sketches import (
        count_min_table,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_count_min,
        streaming_count_min_state,
        streaming_topk_estimates,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    # three "days" of events with a known hot key
    for day in range(3):
        _write_events(spark, src, day * 100, 40)
    streaming_count_min(
        spark, src, ckpt, EVENT_SCHEMA, state, "event_type", width=64
    )

    full = spark.read.schema(EVENT_SCHEMA).parquet(src)
    batch_cm = count_min_table(full, "event_type", width=64)
    merged_cm, cand = streaming_count_min_state(spark, state, "event_type")
    assert sorted(map(tuple, merged_cm.collect())) == sorted(
        map(tuple, batch_cm.collect())
    )

    top = {
        r["event_type"]: r["est_n"]
        for r in streaming_topk_estimates(
            spark, state, "event_type", k=5, width=64
        ).collect()
    }
    true = {
        r["event_type"]: r["n"]
        for r in full.filter("event_type IS NOT NULL")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert all(top[k] >= true[k] for k in top)
    assert set(top) <= set(true)

    # idempotent redelivery: overwriting batch 0's partition with the
    # identical recomputed content leaves the merged state bit-identical
    # (partition REPLACE, never append)
    import os

    before = sorted(map(tuple, merged_cm.collect()))
    b0_dir = os.path.join(state, "cm", "batch=0")
    cm0_rows = spark.read.parquet(b0_dir).collect()  # materialize first
    spark.createDataFrame(cm0_rows).write.mode("overwrite").parquet(b0_dir)
    merged_after, _ = streaming_count_min_state(spark, state, "event_type")
    assert sorted(map(tuple, merged_after.collect())) == before


def test_watermark_hadoop_crash_window_recovers_from_bak(spark, tmp_path):
    """ADVICE r5 (medium): the Hadoop-path swap must never have a
    no-state window. The protocol parks the old state as .bak before
    renaming the new file in; if the writer dies between the renames
    (simulated by deleting the main file while .bak exists), a reader
    recovers the PREVIOUS state instead of silently reprocessing from
    {}."""
    import os

    local = tmp_path / "wm_crash.json"
    wm = Watermark(f"file://{local}", spark)
    wm.advance("fdic", "2021-03-31")
    wm.advance("fdic", "2021-06-30")
    # ADVICE r6: a SUCCESSFUL install removes the parked .bak, so an
    # intentional reset (operator deletes the main state file) starts
    # from {} instead of resurrecting stale state.
    assert not os.path.exists(str(local) + ".bak")
    os.remove(str(local))
    assert Watermark(f"file://{local}", spark).get("fdic") is None
    # simulate the actual crash window: the writer parked the old state
    # as .bak and died before renaming the new file in -- the reader
    # must recover the PREVIOUS state, not reprocess from {}.
    wm = Watermark(f"file://{local}", spark)
    wm.advance("fdic", "2021-06-30")
    os.rename(str(local), str(local) + ".bak")
    assert Watermark(f"file://{local}", spark).get("fdic") == "2021-06-30"
    # and the store heals on the next advance (which also clears .bak)
    wm2 = Watermark(f"file://{local}", spark)
    wm2.advance("fdic", "2021-09-30")
    assert Watermark(f"file://{local}", spark).get("fdic") == "2021-09-30"
    assert not os.path.exists(str(local) + ".bak")


def test_streaming_bloom_matches_batch_and_is_idempotent(spark, tmp_path):
    """The per-batch bitmap partitions merged on read must equal the
    one-shot batch filter of all the data (bit_or monoid); every
    streamed key must probe 1 on the merged state (no false negatives
    across batch boundaries); and re-merging a batch partition twice
    changes nothing (OR is idempotent)."""
    import os

    from bankcreditunion_datapipeline_spark.operators.sketches import (
        bloom_bitmap,
        bloom_might_contain,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_bloom,
        streaming_bloom_state,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    for day in range(3):
        _write_events(spark, src, day * 100, 40)
    streaming_bloom(
        spark, src, ckpt, EVENT_SCHEMA, state, "user_id", m_bits=4096
    )

    full = spark.read.schema(EVENT_SCHEMA).parquet(src)
    batch_bm = bloom_bitmap(full, "user_id", m_bits=4096)
    merged = streaming_bloom_state(spark, state)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, batch_bm.collect())
    )

    seen = full.filter("user_id IS NOT NULL").select("user_id").distinct()
    hits = bloom_might_contain(seen, merged, "user_id", m_bits=4096)
    assert hits.filter("bloom_hit = 0").count() == 0

    # double-merge a batch partition: OR-idempotence means the merged
    # bitmap is bit-identical even if a partition were read twice
    b0 = spark.read.parquet(os.path.join(state, "bloom", "batch=0"))
    doubled = (
        merged.unionByName(b0)
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    assert sorted(map(tuple, doubled.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_streaming_asof_enrich_matches_batch_and_is_idempotent(spark, tmp_path):
    """r7 VERDICT #1: streaming_asof_enrich shipped untested; this is the
    promised equivalence suite.  (a) With a STATIC dim, each left row's
    match depends only on the dim, so the union of per-batch outputs must
    equal the one-shot batch asof_join over all the facts -- backward
    with tolerance + right_ts_as, and forward, both checked.  (b) A
    redelivered micro-batch (same batch_id after a failure, simulated by
    wiping the checkpoint) must REPLACE its batch partition, never
    double-append."""
    import shutil

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from bankcreditunion_datapipeline_spark.operators.temporal import asof_join
    from bankcreditunion_datapipeline_spark.streaming.joins import (
        streaming_asof_enrich,
    )

    fact_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("ts", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    dim_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", LongType()),
            StructField("rate", DoubleType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    dim_dir = str(tmp_path / "dim")

    # dim: users 0..2 with rate versions at ts 0/100/200; user 3 has NO
    # dim rows (unmatched -> NULL); the 300-gap between versions lets
    # tolerance=60 reject far matches.
    dim_rows = [
        (u, t, float(u * 1000 + t)) for u in range(3) for t in (0, 100, 200)
    ]
    spark.createDataFrame(dim_rows, dim_schema).coalesce(1).write.parquet(
        dim_dir
    )

    def write_facts(start_id, n):
        rows = [
            (i, i % 4, (i * 37) % 260, float(i))
            for i in range(start_id, start_id + n)
        ]
        spark.createDataFrame(rows, fact_schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        streaming_asof_enrich(
            spark,
            src,
            ckpt,
            fact_schema,
            dim_dir,
            out,
            ["user_id"],
            "ts",
            ["rate"],
            direction="backward",
            tolerance=60,
            right_ts_as="dim_ts",
        )

    cols = ["event_id", "user_id", "ts", "value", "rate", "dim_ts"]

    def rows_of(df):
        return sorted(map(tuple, df.select(*cols).collect()))

    # batch 0, then redeliver IT (checkpoint wiped -> same files replay
    # as batch 0): the partition must be replaced, not doubled.
    write_facts(0, 30)
    run()
    first = rows_of(spark.read.parquet(out))
    shutil.rmtree(ckpt)
    run()
    assert rows_of(spark.read.parquet(out)) == first

    # batch 1 on the delta only; union of batch outputs == one-shot
    # batch asof_join over all the facts.
    write_facts(100, 30)
    run()
    streamed = spark.read.parquet(out)
    assert sorted(r["batch"] for r in streamed.select("batch").distinct().collect()) == [0, 1]
    twin = asof_join(
        spark.read.schema(fact_schema).parquet(src),
        spark.read.parquet(dim_dir),
        ["user_id"],
        "ts",
        ["rate"],
        direction="backward",
        tolerance=60,
        right_ts_as="dim_ts",
    )
    assert rows_of(streamed) == rows_of(twin)
    # the matched side must be exercised in every class: matched-in-
    # tolerance, rejected-by-tolerance/unmatched-user -> NULL
    got = rows_of(streamed)
    assert any(r[4] is not None for r in got)
    assert any(r[4] is None for r in got)

    # forward direction, fresh dirs: same equivalence
    src2 = str(tmp_path / "src2")
    spark.createDataFrame(
        [(i, i % 4, (i * 53) % 260, float(i)) for i in range(25)], fact_schema
    ).coalesce(1).write.parquet(src2)
    out2 = str(tmp_path / "out2")
    streaming_asof_enrich(
        spark,
        src2,
        str(tmp_path / "ckpt2"),
        fact_schema,
        dim_dir,
        out2,
        ["user_id"],
        "ts",
        ["rate"],
        direction="forward",
    )
    twin_fwd = asof_join(
        spark.read.schema(fact_schema).parquet(src2),
        spark.read.parquet(dim_dir),
        ["user_id"],
        "ts",
        ["rate"],
        direction="forward",
    )
    fcols = ["event_id", "user_id", "ts", "value", "rate"]
    assert sorted(
        map(tuple, spark.read.parquet(out2).select(*fcols).collect())
    ) == sorted(map(tuple, twin_fwd.select(*fcols).collect()))


def test_streaming_log_histogram_matches_batch_and_is_idempotent(spark, tmp_path):
    """r7 VERDICT #4: the log-bucket quantile sketch's streaming twin.
    Data-independent bucket edges make per-batch histograms a pure
    sum-monoid, so (a) the merged streaming state must equal the
    one-shot batch histogram, (b) streamed quantile estimates must
    equal the batch extractor's (grouped AND global), and (c) a
    redelivered batch (checkpoint wiped, same files replay as batch 0)
    must REPLACE its partition, not double-count."""
    import os
    import shutil

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bankcreditunion_datapipeline_spark.operators.sketches import (
        log_histogram,
        log_histogram_quantiles,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_log_histogram,
        streaming_log_histogram_state,
        streaming_quantile_estimates,
    )

    schema = StructType(
        [
            StructField("g", StringType()),
            StructField("v", LongType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    def write_wave(start, n):
        rows = [
            (("a" if i % 3 else "b"), (i * i * 97) % 50_000 + 1)
            for i in range(start, start + n)
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        streaming_log_histogram(
            spark, src, ckpt, schema, state, "v", group_cols=("g",)
        )

    # batch 0, then redeliver it: partition replaced, not doubled
    write_wave(0, 500)
    run()
    first = sorted(
        map(tuple, streaming_log_histogram_state(spark, state, ("g",)).collect())
    )
    shutil.rmtree(ckpt)
    run()
    assert (
        sorted(
            map(
                tuple,
                streaming_log_histogram_state(spark, state, ("g",)).collect(),
            )
        )
        == first
    )

    # two more waves, then: merged state == one-shot batch histogram,
    # and streamed quantiles == batch extractor output
    write_wave(500, 400)
    run()
    write_wave(900, 300)
    run()
    assert len(os.listdir(os.path.join(state, "loghist"))) >= 3

    full = spark.read.schema(schema).parquet(src)
    batch_hist = log_histogram(full, "v", group_cols=("g",))
    merged = streaming_log_histogram_state(spark, state, ("g",))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, batch_hist.collect())
    )

    probs = [500, 950, 990]
    streamed_q = streaming_quantile_estimates(
        spark, state, probs, group_cols=("g",)
    )
    batch_q = log_histogram_quantiles(batch_hist, probs, group_cols=("g",))
    assert sorted(map(tuple, streamed_q.collect())) == sorted(
        map(tuple, batch_q.collect())
    )


def test_streaming_scd2_matches_batch_and_is_idempotent(spark, tmp_path):
    """Streaming SCD2 (merge-on-read): (a) the state extractor over the
    streamed change log equals batch scd2_compact over the union of all
    input events -- including an OUT-OF-ORDER second file whose events
    predate the first file's (per-batch interval closing would get this
    wrong; compaction-on-read cannot); (b) wiping the checkpoint and
    re-streaming REPLACES batch partitions, never duplicates -- and
    even where re-batching leaves a stale partition with duplicate
    change rows, scd2_compact is DUPLICATION-TOLERANT by construction
    (identical (ts, tiebreak) rows sort adjacent, the second is never
    a state change), which is why a full-log replay stays exact where
    a count monitor's would not (see the skew monitor's redelivery
    shape below)."""
    import shutil

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bankcreditunion_datapipeline_spark.operators.temporal import (
        scd2_compact,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_scd2,
        streaming_scd2_state,
    )

    schema = StructType(
        [
            StructField("user", StringType()),
            StructField("state", StringType()),
            StructField("ts", LongType()),
            StructField("eid", LongType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    batch1 = [("u1", "free", 100, 1), ("u1", "paid", 300, 2),
              ("u2", "paid", 50, 3)]
    # out-of-order: u1 had an earlier state the first file missed
    batch2 = [("u1", "trial", 10, 4), ("u2", "free", 400, 5)]

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        streaming_scd2(
            spark, src, ckpt, schema, state, "user", "state", "ts",
            order_tiebreak=["eid"],
        )

    write(batch1)
    run()
    write(batch2)
    run()

    got = sorted(
        (r["user"], r.state, r.effective_from, r.effective_to, r.is_current)
        for r in streaming_scd2_state(
            spark, state, "user", "state", "ts", order_tiebreak=["eid"]
        ).collect()
    )
    want_df = scd2_compact(
        spark.createDataFrame(batch1 + batch2, schema),
        "user", "state", "ts", order_tiebreak=["eid"],
    )
    want = sorted(
        (r["user"], r.state, r.effective_from, r.effective_to, r.is_current)
        for r in want_df.collect()
    )
    assert got == want
    # the out-of-order event really opened an earlier interval
    assert ("u1", "trial", 10, 100, 0) in got

    # redelivery: wipe checkpoint, re-stream everything -> partitions
    # are REPLACED (same state), not appended
    shutil.rmtree(ckpt)
    run()
    again = sorted(
        (r["user"], r.state, r.effective_from, r.effective_to, r.is_current)
        for r in streaming_scd2_state(
            spark, state, "user", "state", "ts", order_tiebreak=["eid"]
        ).collect()
    )
    assert again == want


def test_streaming_key_skew_matches_batch_and_is_idempotent(spark, tmp_path):
    """Streaming skew monitor: merged batch=<id> count partitions must
    extract the SAME report as batch key_skew_report over the union of
    all input (counts are a sum monoid); checkpoint-wipe redelivery
    replaces partitions, never double-counts."""
    import shutil

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from bankcreditunion_datapipeline_spark.operators.analytics import (
        key_skew_report,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_key_counts,
        streaming_key_skew_report,
    )

    schema = StructType(
        [StructField("k", StringType()), StructField("x", LongType())]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    b1 = [("a", 1)] * 5 + [("b", 1)] * 2 + [(None, 1)]
    b2 = [("a", 1)] * 3 + [("c", 1)] * 4

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        streaming_key_counts(spark, src, ckpt, schema, state, "k")

    # batch 0, then redeliver IT (checkpoint wiped while only batch 0
    # exists -> same files replay as batch 0, the house redelivery
    # shape): the count partition is REPLACED, not doubled
    write(b1)
    run()
    first = streaming_key_skew_report(spark, state).collect()[0]
    shutil.rmtree(ckpt)
    run()
    assert (
        streaming_key_skew_report(spark, state).collect()[0].asDict()
        == first.asDict()
    )

    write(b2)
    run()
    got = streaming_key_skew_report(spark, state).collect()[0]
    want = key_skew_report(
        spark.createDataFrame(b1 + b2, schema), "k"
    ).collect()[0]
    assert got.asDict() == want.asDict()
    # the cross-batch merge really summed: 'a' has 8 across batches
    assert got.max_mult == 8 and got.top_key == "a"


def test_streaming_sum_delta_equals_batch_and_redelivery(spark, tmp_path):
    """Streaming incremental view maintenance (q226's apply_sum_delta as
    the merge-on-read extractor): folding the per-batch delta
    partitions through apply_sum_delta equals the monolithic groupBy
    recompute over ALL input; checkpoint-wipe redelivery replaces the
    batch partition, never double-counts; a NULL grain key is a
    legitimate stratum that merges across batches."""
    import shutil

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_sum_delta,
        streaming_sum_delta_state,
    )

    schema = StructType(
        [
            StructField("day", StringType()),
            StructField("ones", LongType()),
            StructField("cents", LongType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    b1 = [("d1", 1, 100), ("d1", 1, 250), ("d2", 1, 40), (None, 1, 7)]
    b2 = [("d2", 1, 60), ("d3", 1, 500), (None, 1, 3)]

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        streaming_sum_delta(
            spark, src, ckpt, schema, state, ["day"], ["ones", "cents"]
        )

    def extract():
        return {
            r["day"]: (r["ones"], r["cents"])
            for r in streaming_sum_delta_state(
                spark, state, ["day"], ["ones", "cents"]
            ).collect()
        }

    write(b1)
    run()
    first = extract()
    assert first == {"d1": (2, 350), "d2": (1, 40), None: (1, 7)}
    # redelivery: wipe the checkpoint while only batch 0 exists -- the
    # same files replay as batch 0 and must REPLACE its partition
    shutil.rmtree(ckpt)
    run()
    assert extract() == first

    write(b2)
    run()
    got = extract()
    # streaming == batch: the monolithic recompute over all input
    want = {
        r["day"]: (r["ones"], r["cents"])
        for r in spark.createDataFrame(b1 + b2, schema)
        .groupBy("day")
        .agg(F.sum("ones").alias("ones"), F.sum("cents").alias("cents"))
        .collect()
    }
    assert got == want
    assert got[None] == (2, 10) and got["d2"] == (2, 100)


def test_streaming_top_key_shares_equals_batch(spark, tmp_path):
    """The top-key drill-down over merged streaming count state equals
    batch conform.top_key_shares over the union of all input."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from bankcreditunion_datapipeline_spark.operators.conform import (
        top_key_shares,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_key_counts,
        streaming_top_key_shares,
    )

    schema = StructType(
        [StructField("k", StringType()), StructField("x", LongType())]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    b1 = [("a", 1)] * 6 + [("b", 1)] * 3
    b2 = [("a", 1)] * 2 + [("c", 1)] * 5

    for rows in (b1, b2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        streaming_key_counts(spark, src, ckpt, schema, state, "k")

    got = [
        (r["k"], r["n_rows"], r["share"])
        for r in streaming_top_key_shares(spark, state, top_k=2).collect()
    ]
    want = [
        (r["k"], r["n_rows"], r["share"])
        for r in top_key_shares(
            spark.createDataFrame(b1 + b2, schema), ["k"], top_k=2
        ).collect()
    ]
    assert got == want and got[0][0] == "a" and got[0][1] == 8


def test_streaming_dup_clusters_equals_batch(spark, tmp_path):
    """Folding streamed pair deltas through extend_components equals
    monolithic connected_components over all pairs -- including a
    late batch that MERGES two standing clusters; checkpoint-wipe
    redelivery replaces the partition."""
    import shutil

    from pyspark.sql.types import LongType, StructField, StructType

    from bankcreditunion_datapipeline_spark.operators.dedup import (
        connected_components,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_dup_clusters,
        streaming_pair_deltas,
    )

    schema = StructType(
        [StructField("id_a", LongType()), StructField("id_b", LongType())]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    b1 = [(1, 2), (4, 5)]
    b2 = [(2, 4), (7, 8)]  # (2,4) merges {1,2} with {4,5}

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        streaming_pair_deltas(spark, src, ckpt, schema, state)

    write(b1)
    run()
    first = {
        r["id"]: r["component"]
        for r in streaming_dup_clusters(spark, state).collect()
    }
    assert first == {1: 1, 2: 1, 4: 4, 5: 4}
    shutil.rmtree(ckpt)
    run()
    assert {
        r["id"]: r["component"]
        for r in streaming_dup_clusters(spark, state).collect()
    } == first

    write(b2)
    run()
    got = {
        r["id"]: r["component"]
        for r in streaming_dup_clusters(spark, state).collect()
    }
    want = {
        r["id"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(b1 + b2, schema)
        ).collect()
    }
    assert got == want and got[5] == 1 and got[8] == 7


def test_streaming_diversity_equals_batch(spark, tmp_path):
    """The diversity extractor over merged streaming token-count
    partials equals batch gini_simpson_diversity over the union of
    all input -- (T, sum c^2) is a sum-monoid over per-batch counts."""
    from pyspark.sql.types import StringType, StructField, StructType

    from bankcreditunion_datapipeline_spark.operators.text import (
        gini_simpson_diversity,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_diversity,
        streaming_token_counts,
    )

    schema = StructType(
        [StructField("source", StringType()), StructField("text", StringType())]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    b1 = [("a", "x x y"), ("b", "p q")]
    b2 = [("a", "x z  z"), ("b", None)]

    for rows in (b1, b2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        streaming_token_counts(spark, src, ckpt, schema, state)

    got = sorted(
        (r.source, r.n_tokens, r.n_distinct, r.diversity_e6)
        for r in streaming_diversity(spark, state).collect()
    )
    want = sorted(
        (r.source, r.n_tokens, r.n_distinct, r.diversity_e6)
        for r in gini_simpson_diversity(
            spark.createDataFrame(b1 + b2, schema), "text"
        ).collect()
    )
    assert got == want
    # source a: counts {x:3, y:1, z:2}, T=6 -> 1 - 14/36 = 611111
    assert ("a", 6, 3, 611_111) in got


def test_streaming_diversity_redelivery_idempotent(spark, tmp_path):
    """Checkpoint-wipe redelivery overwrites the batch partition --
    the merged metric is unchanged (replace, never double-count)."""
    import shutil

    from pyspark.sql.types import StringType, StructField, StructType

    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_diversity,
        streaming_token_counts,
    )

    schema = StructType(
        [StructField("source", StringType()), StructField("text", StringType())]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    spark.createDataFrame([("a", "x x y")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    streaming_token_counts(spark, src, ckpt, schema, state)
    before = sorted(map(tuple, streaming_diversity(spark, state).collect()))
    shutil.rmtree(ckpt)  # wipe checkpoint -> full redelivery
    streaming_token_counts(spark, src, ckpt, schema, state)
    after = sorted(map(tuple, streaming_diversity(spark, state).collect()))
    assert before == after


def test_streaming_holt_forecast_equals_batch(spark, tmp_path):
    """The Holt extractor over merged streaming day-cents deltas equals
    the batch recursion over the union of all input -- cents merge as
    an exact sum monoid BEFORE the recursion sees doubles."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bankcreditunion_datapipeline_spark.operators.temporal import (
        holt_linear_by_key,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_holt_forecast,
        streaming_sum_delta,
    )

    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("day", LongType()),
            StructField("cents", LongType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    # batch 2 adds MORE cents to day 2 (late data) and a new day 3
    b1 = [("a", 1, 200), ("a", 2, 100), ("b", 1, 500)]
    b2 = [("a", 2, 300), ("a", 3, 600), ("b", 2, 100)]
    for rows in (b1, b2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        streaming_sum_delta(spark, src, ckpt, schema, state, ["k", "day"], ["cents"])

    got = {
        r.k: (r.last_day, r.level, r.trend, r.forecast)
        for r in streaming_holt_forecast(
            spark, state, ["k"], "day", "cents", horizon=7
        ).collect()
    }
    # batch equivalent over the union
    merged = (
        spark.createDataFrame(b1 + b2, schema)
        .groupBy("k", "day")
        .agg((__import__("pyspark").sql.functions.sum("cents") / 100).alias("__v"))
    )
    sm = holt_linear_by_key(merged, "k", "day", "__v")
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("k").orderBy(F.desc("day"))
    want = {
        r.k: (r.day, r.level, r.trend, r.level + 7 * r.trend)
        for r in sm.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .collect()
    }
    assert got == want
    # hand value: key a days: 1->2.0, 2->4.0, 3->6.0 (cents/100)
    # l3=4.75, b3=1.125, forecast = 4.75 + 7*1.125 = 12.625
    assert got["a"] == (3, 4.75, 1.125, 12.625)


def test_streaming_budget_caps_equals_batch(spark, tmp_path):
    """Water-filling over merged streaming token counts equals the
    batch operator over per-group total masses of the union."""
    from pyspark.sql.types import StringType, StructField, StructType

    from bankcreditunion_datapipeline_spark.operators.sampling import (
        water_filling_caps,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_budget_caps,
        streaming_token_counts,
    )

    schema = StructType(
        [StructField("source", StringType()), StructField("text", StringType())]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    b1 = [("tiny", "a b"), ("giant", " ".join(["x"] * 50))]
    b2 = [("giant", " ".join(["y"] * 49)), ("small", "p q r s t u v w")]
    for rows in (b1, b2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        streaming_token_counts(spark, src, ckpt, schema, state)

    got = sorted(map(tuple, streaming_budget_caps(spark, state).collect()))
    # batch twin: masses tiny=2, giant=99, small=8 -> budget=43
    masses = spark.createDataFrame(
        [("tiny", 2), ("giant", 99), ("small", 8)], "source string, m long"
    )
    want = sorted(
        map(tuple, water_filling_caps(masses, "source", "m").collect())
    )
    assert got == want
    caps = {r[0]: r[2] for r in got}
    assert caps["giant"] == 33  # 2+8+33 = 43 = floor(109*2/5)


def test_streaming_vmr_equals_batch(spark, tmp_path):
    """The VMR extractor over merged streaming daily-count partials
    equals batch burstiness_vmr_e6 over the union of all input --
    (n, Sx, Sxx) are sum-monoids over per-batch (key, day) counts,
    even when one day's events are SPLIT across batches."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from bankcreditunion_datapipeline_spark.operators.analytics import (
        burstiness_vmr_e6,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_daily_counts,
        streaming_vmr,
    )

    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    day = datetime.timedelta(days=1)
    # day 0 of 'a' is split across the two batches (1 + 2 events);
    # NULL ts must be dropped, not attributed
    b1 = [("a", t0), ("a", t0 + day), ("b", t0), ("b", None)]
    b2 = [("a", t0), ("a", t0), ("a", t0 + 2 * day), ("b", t0 + day)]

    for rows in (b1, b2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        streaming_daily_counts(
            spark, src, ckpt, schema, state, ["event_type"]
        )

    got = sorted(
        map(tuple, streaming_vmr(spark, state, ["event_type"]).collect())
    )
    batch_daily = (
        spark.createDataFrame(b1 + b2, schema)
        .filter(F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    want = sorted(
        map(
            tuple,
            burstiness_vmr_e6(batch_daily, ["event_type"], "x").collect(),
        )
    )
    assert got == want
    # 'a' days: {0: 3, 1: 1, 2: 1} -> n=3 Sx=5 Sxx=11 ->
    # (33-25)*1e6 div (2*5) = 800000
    assert ("a", 3, 5, 800_000) in got


def test_streaming_vmr_redelivery_idempotent(spark, tmp_path):
    """Checkpoint-wipe redelivery overwrites the batch partition --
    the merged moments are unchanged (replace, never double-count)."""
    import datetime
    import shutil

    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_daily_counts,
        streaming_vmr,
    )

    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [("a", t0), ("a", t0 + datetime.timedelta(days=1))]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    streaming_daily_counts(spark, src, ckpt, schema, state, ["event_type"])
    before = sorted(
        map(tuple, streaming_vmr(spark, state, ["event_type"]).collect())
    )
    shutil.rmtree(ckpt)
    streaming_daily_counts(spark, src, ckpt, schema, state, ["event_type"])
    after = sorted(
        map(tuple, streaming_vmr(spark, state, ["event_type"]).collect())
    )
    assert before == after and len(before) == 1


def test_streaming_backlog_equals_batch(spark, tmp_path):
    """The backlog extractor over merged streaming interval-delta
    partials equals batch interval_deltas |> backlog_from_deltas over
    the union of all input -- per-day (opened, closed) are sum
    monoids, even when one day's deltas are split across batches."""
    import datetime

    from pyspark.sql.types import DateType, StructField, StructType

    from bankcreditunion_datapipeline_spark.operators.intervals import (
        backlog_from_deltas,
        interval_deltas,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_backlog,
        streaming_interval_deltas,
    )

    schema = StructType(
        [StructField("od", DateType()), StructField("sd", DateType())]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    d = lambda i: datetime.date(2024, 1, i)  # noqa: E731
    b1 = [(d(1), d(5)), (d(2), d(3)), (None, d(4)), (d(9), d(2))]
    b2 = [(d(1), d(2)), (d(4), d(8))]  # day-1 open split across batches

    for rows in (b1, b2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        streaming_interval_deltas(
            spark, src, ckpt, schema, state, "od", "sd"
        )

    got = sorted(map(tuple, streaming_backlog(spark, state).collect()))
    valid = [
        r
        for r in b1 + b2
        if r[0] is not None and r[1] is not None and r[1] >= r[0]
    ]
    batch = backlog_from_deltas(
        interval_deltas(
            spark.createDataFrame(valid, schema), "od", "sd"
        )
    )
    want = sorted(map(tuple, batch.collect()))
    assert got == want
    by_day = {r[0]: r for r in got}
    # days 1-2 have 3 open ([1,5], [2,3] from day 2, [1,2]); day 4:
    # [1,5] + [4,8] = 2; NULL/reversed rows dropped
    assert by_day[d(2)][3] == 3
    assert by_day[d(4)][3] == 2


def test_streaming_freshness_staleness_vs_state_max(spark, tmp_path):
    """Per-key last observed day + staleness vs the newest day anywhere
    in the state; redelivered/split batches land exactly (max is a
    monoid)."""
    import datetime

    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_daily_counts,
        streaming_freshness,
    )

    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    day = datetime.timedelta(days=1)
    b1 = [("a", t0), ("b", t0), ("b", t0 + day)]
    b2 = [("a", t0 + 5 * day), ("a", t0 + 5 * day)]  # 'a' catches up

    for rows in (b1, b2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        streaming_daily_counts(
            spark, src, ckpt, schema, state, ["event_type"]
        )

    got = {
        r["event_type"]: r
        for r in streaming_freshness(spark, state, ["event_type"]).collect()
    }
    assert got["a"]["staleness_days"] == 0
    assert got["a"]["n_events"] == 3
    assert got["b"]["staleness_days"] == 4  # last seen day 1, ref day 5
    assert got["b"]["n_events"] == 2


def test_streaming_lead_lag_equals_batch(spark, tmp_path):
    """The lead/lag extractor over merged streaming daily-count
    partials equals batch cross_correlation_e6 over the union of all
    input, split-day batches included."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from bankcreditunion_datapipeline_spark.operators.analytics import (
        cross_correlation_e6,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_daily_counts,
        streaming_lead_lag,
    )

    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    day = datetime.timedelta(days=1)
    # y echoes x two days later with proportional volume
    rows = []
    for d, n in ((0, 3), (1, 1), (2, 4), (3, 1), (4, 5)):
        rows += [("view", t0 + d * day)] * n
        rows += [("purchase", t0 + (d + 2) * day)] * n
    b1, b2 = rows[: len(rows) // 2], rows[len(rows) // 2 :]

    for batch in (b1, b2):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        streaming_daily_counts(
            spark, src, ckpt, schema, state, ["event_type"]
        )

    got = sorted(
        map(
            tuple,
            streaming_lead_lag(
                spark, state, "event_type", "view", "purchase"
            ).collect(),
        )
    )
    daily = (
        spark.createDataFrame(b1 + b2, schema)
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    x = daily.filter(F.col("event_type") == "view").select(
        "day", F.col("c").alias("x")
    )
    y = daily.filter(F.col("event_type") == "purchase").select(
        "day", F.col("c").alias("y")
    )
    want = sorted(
        map(tuple, cross_correlation_e6(x, y, range(-3, 4)).collect())
    )
    assert got == want
    by_lag = {r[0]: r[2] for r in got}
    assert by_lag[2] in (999_999, 1_000_000)  # exact echo at lag +2


def test_streaming_lateness_equals_batch(spark, tmp_path):
    """The lateness monitor over merged histogram partials equals the
    batch q316 readout when batches split the arrival (id) order --
    including a CROSS-BATCH late event whose lateness comes from the
    max-so-far state, not its own batch."""
    import datetime

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from bankcreditunion_datapipeline_spark.queries import (
        q316_out_of_orderness,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_lateness,
        streaming_lateness_summary,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    h = datetime.timedelta(hours=1)
    # batch 1 peaks at t0+5h; batch 2 opens with an event 3h OLDER
    # than that peak (cross-batch lateness = 180 min) and one in-batch
    # late event (id 6, 60 min behind id 5's local max)
    b1 = [(1, t0), (2, t0 + 5 * h), (3, None)]
    b2 = [(4, t0 + 2 * h), (5, t0 + 6 * h), (6, t0 + 5 * h), (None, t0)]

    for rows in (b1, b2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        streaming_lateness(spark, src, ckpt, schema, state)

    got = sorted(
        map(
            tuple,
            streaming_lateness_summary(spark, state).collect(),
        )
    )
    # batch oracle: same rows through q316 (events table shape)
    allrows = [
        (i, ts, 7, "view", 1.0, "{}")
        for i, ts in b1 + b2
    ]
    spark.createDataFrame(
        allrows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    want = sorted(
        map(tuple, q316_out_of_orderness(spark, str(tmp_path)).collect())
    )
    assert got == want
    # the cross-batch event (id 4) is 180 min late: p99 = 180
    assert any(r[0] == 990 and r[1] == 180 for r in got)


def test_streaming_lateness_redelivery_idempotent(spark, tmp_path):
    """Checkpoint-wipe redelivery overwrites both the histogram and
    max-so-far batch partitions -- the merged readout is unchanged."""
    import datetime
    import shutil

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_lateness,
        streaming_lateness_summary,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    h = datetime.timedelta(hours=1)
    spark.createDataFrame(
        [(1, t0 + 2 * h), (2, t0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    streaming_lateness(spark, src, ckpt, schema, state)
    first = sorted(
        map(tuple, streaming_lateness_summary(spark, state).collect())
    )
    shutil.rmtree(ckpt)  # wipe checkpoint -> full redelivery
    streaming_lateness(spark, src, ckpt, schema, state)
    again = sorted(
        map(tuple, streaming_lateness_summary(spark, state).collect())
    )
    assert first == again
    assert any(r[0] == 990 and r[1] == 120 for r in first)


def test_streaming_quality_deciles_match_batch_and_idempotent(spark, tmp_path):
    """q319's streaming twin: per-(source, qint) counts are a
    sum-monoid over a BOUNDED value domain, so the merged stream state
    determines every order statistic exactly -- (a) merged state ==
    one-shot batch counts, (b) streamed decile boundaries == the
    shared finisher over the batch counts, (c) a redelivered batch
    replaces its partition.  The finisher must also agree with a
    direct per-source ntile: the max qint inside tile k (window form)
    equals boundary_qint at tile k whenever tile sizes are exact
    multiples (here 40 docs / 10 tiles per source)."""
    import shutil

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bankcreditunion_datapipeline_spark.operators.text import (
        quality_score,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        quality_decile_boundaries,
        streaming_source_quality_counts,
        streaming_quality_decile_boundaries,
        streaming_source_quality_state,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    def doc(i):
        # vary length and punctuation so qint spreads
        body = ("word " * (5 + (i * 7) % 60)).strip()
        if i % 4 == 0:
            body += " !!!???"
        return (i, "s" + str(i % 2), body)

    def write_wave(start, n):
        rows = [doc(i) for i in range(start, start + n)]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        streaming_source_quality_counts(spark, src, ckpt, schema, state)

    write_wave(0, 30)
    run()
    first = sorted(
        map(tuple, streaming_source_quality_state(spark, state).collect())
    )
    shutil.rmtree(ckpt)
    run()
    assert (
        sorted(
            map(tuple, streaming_source_quality_state(spark, state).collect())
        )
        == first
    )

    write_wave(30, 50)
    run()

    full = spark.read.schema(schema).parquet(src)
    import pyspark.sql.functions as F

    batch_counts = (
        full.filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .select(
            "source",
            F.floor(quality_score(F.col("text")) * 1000000)
            .cast("long")
            .alias("qint"),
        )
        .groupBy("source", "qint")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    merged = streaming_source_quality_state(spark, state)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, batch_counts.collect())
    )

    streamed_b = streaming_quality_decile_boundaries(spark, state)
    batch_b = quality_decile_boundaries(batch_counts)
    assert sorted(map(tuple, streamed_b.collect())) == sorted(
        map(tuple, batch_b.collect())
    )
    got = {
        (r["source"], r["tile"]): r["boundary_qint"]
        for r in streamed_b.collect()
    }
    assert len(got) == 20  # 2 sources x 10 tiles

    # window-form agreement: per-source ntile(10) over (qint, doc_id);
    # with 40 docs per source every tile has exactly 4 rows, so the
    # tile's max qint IS the ceil-div boundary
    from pyspark.sql.window import Window

    per = full.select(
        "source",
        "doc_id",
        F.floor(quality_score(F.col("text")) * 1000000)
        .cast("long")
        .alias("qint"),
    )
    wf = per.withColumn(
        "tile",
        F.ntile(10).over(
            Window.partitionBy("source").orderBy("qint", "doc_id")
        ),
    )
    want = {
        (r["source"], r["tile"]): r["b"]
        for r in wf.groupBy("source", "tile")
        .agg(F.max("qint").alias("b"))
        .collect()
    }
    assert got == want

    # REMAINDER case (the r11 ADVICE gap): +13 docs makes the source
    # counts 47/46 -- not multiples of 10 -- and the boundary must
    # STILL equal the window-form ntile tile max (the finisher uses
    # ntile tile-end ranks t*(N div k) + least(t, N % k), not the
    # ceil-div rank, which diverges here: N=46, t=5 -> rank 23 both,
    # but N=47, t=5 -> ntile 25 vs ceil-div 24)
    write_wave(80, 13)
    run()
    full2 = spark.read.schema(schema).parquet(src)
    streamed_b2 = streaming_quality_decile_boundaries(spark, state)
    got2 = {
        (r["source"], r["tile"]): r["boundary_qint"]
        for r in streamed_b2.collect()
    }
    wf2 = full2.select(
        "source",
        "doc_id",
        F.floor(quality_score(F.col("text")) * 1000000)
        .cast("long")
        .alias("qint"),
    ).withColumn(
        "tile",
        F.ntile(10).over(
            Window.partitionBy("source").orderBy("qint", "doc_id")
        ),
    )
    want2 = {
        (r["source"], r["tile"]): r["b"]
        for r in wf2.groupBy("source", "tile")
        .agg(F.max("qint").alias("b"))
        .collect()
    }
    assert got2 == want2


def test_streaming_survivor_clusters_equals_monolithic(spark, tmp_path):
    """q320's stream twin: folding pair-delta batches with only
    (labels, survivors) state -- candidates from {standing survivors
    UNION delta endpoints} -- must equal pick_survivors over the
    monolithic CC of ALL pairs, per policy; a redelivered batch
    (checkpoint wiped) must not change the state."""
    import shutil

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    from bankcreditunion_datapipeline_spark.operators.dedup import (
        connected_components,
        pick_survivors,
    )
    from bankcreditunion_datapipeline_spark.streaming.incremental import (
        streaming_pair_deltas,
        streaming_survivor_clusters,
    )

    schema = StructType(
        [StructField("id_a", LongType()), StructField("id_b", LongType())]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    attrs = spark.createDataFrame(
        [
            (1, 10), (2, 90), (3, 50), (4, 95), (5, 20),
            (6, 70), (7, 30), (8, 60), (9, 40), (10, 80), (11, 5),
        ],
        "id long, q long",
    )
    policies = {
        "s_min": [("id", "asc")],
        "s_q": [("q", "desc"), ("id", "asc")],
    }

    def write_wave(pairs):
        spark.createDataFrame(pairs, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        streaming_pair_deltas(spark, src, ckpt, schema, state)

    # wave 1: two clusters + a 3-chain; wave 2 merges them and pulls
    # in an old singleton; wave 3 is a brand-new cluster
    write_wave([(1, 2), (2, 3), (4, 5), (8, 9), (9, 11)])
    run()
    write_wave([(3, 4), (6, 7), (9, 10)])
    run()
    s1 = sorted(
        map(
            tuple,
            streaming_survivor_clusters(
                spark, state, attrs, policies
            ).collect(),
        )
    )
    # redelivery: wipe checkpoint, replay everything -- partitions
    # replaced, state identical
    shutil.rmtree(ckpt)
    run()
    s2 = sorted(
        map(
            tuple,
            streaming_survivor_clusters(
                spark, state, attrs, policies
            ).collect(),
        )
    )
    assert s1 == s2

    all_pairs = spark.read.schema(schema).parquet(src)
    mono = pick_survivors(
        connected_components(all_pairs).join(attrs, "id"), policies
    )
    assert s1 == sorted(map(tuple, mono.collect()))
    got = {r[0]: (r[1], r[2]) for r in s1}
    # merged {1..5}: min 1, quality survivor 4; {6,7}: quality 6
    assert got[1] == (1, 4)
    assert got[6] == (6, 6)

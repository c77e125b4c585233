"""Kappa parity: Structured Streaming results == batch results."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_vector_database_spark.plans import registry
from rag_vector_database_spark.session import read_events
from rag_vector_database_spark.streaming import events as se


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = se.run_available_now(
        se.tumbling_counts(se.read_events_stream(spark, sf_dir)))
    batch = registry.q_events_tumbling(spark, sf_dir)
    cols = ["ws", "event_type", "n", "sum_value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_sessions_equal_batch_sessionizer(spark, sf_dir):
    """session_window(gap) must produce the same (user, start, end,
    count) sessions as the batch lag+cumsum formulation."""
    stream = se.run_available_now(
        se.session_counts(se.read_events_stream(spark, sf_dir)))
    batch = registry.q_events_sessionize(spark, sf_dir)
    got = _rows(stream, ["user_id", "session_start_us", "n_events"])
    want = _rows(batch, ["user_id", "session_start_us", "n_events"])
    assert got == want


def test_incremental_pacing(spark, sf_dir):
    """maxFilesPerTrigger paces the backfill without changing results."""
    stream = se.run_available_now(
        se.tumbling_counts(
            se.read_events_stream(spark, sf_dir, max_files_per_trigger=1)))
    assert stream.count() == registry.q_events_tumbling(spark, sf_dir).count()


def test_stateful_counts_equal_batch_groupby(spark, sf_dir):
    """applyInPandasWithState cumulative counts: last (= max) emission
    per user equals the batch groupBy count."""
    from pyspark.sql import functions as F
    emitted = se.run_available_now(
        se.stateful_user_counts(se.read_events_stream(spark, sf_dir)),
        output_mode="update")
    got = (emitted.groupBy("user_id")
           .agg(F.max("n_events").alias("n")))
    batch = (spark.read.parquet(f"{sf_dir}/events.parquet")
             .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")))
    assert _rows(got, ["user_id", "n"]) == _rows(batch, ["user_id", "n"])


def test_checkpoint_is_the_processed_log(spark, sf_dir, tmp_path):
    """#59's core claim: the checkpoint IS the processed-log. A
    checkpointed file-source stream drained twice over the same input
    writes every row exactly once — the second drain finds no new
    files and appends nothing (the reference re-derives this guarantee
    from hand-kept log files; here it is free)."""
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (se.read_events_stream(spark, sf_dir)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    n1 = spark.read.parquet(out).count()
    drain()
    n2 = spark.read.parquet(out).count()
    assert n1 > 0 and n2 == n1  # run-twice => +0 rows


def test_foreach_batch_upsert_keep_latest(spark, sf_dir, tmp_path):
    """foreachBatch MERGE sink: drained stream leaves exactly one row
    per key (the latest by ts), matching the batch keep-latest; a
    second drain over the same input changes nothing."""
    out = str(tmp_path / "merged")
    ckpt = str(tmp_path / "ck")
    stream = se.read_events_stream(spark, sf_dir) \
        .select("user_id", "ts", "event_type")
    se.foreach_batch_upsert(stream, out, key="user_id",
                            order_col="ts", checkpoint=ckpt)
    got = spark.read.parquet(out)
    # one row per user, and it is that user's max-ts event
    per_user = got.groupBy("user_id").count().where("count > 1").count()
    assert per_user == 0
    e = read_events(spark, sf_dir)
    want = e.groupBy("user_id").agg(F.max("ts").alias("ts"))
    joined = got.join(want, ["user_id", "ts"])
    assert joined.count() == got.count() == want.count()


def test_foreach_batch_upsert_crash_recovery_exactly_once(spark, tmp_path):
    """Crash-recovery proof for the streaming MERGE (#59 discipline):
    the query dies between micro-batches, a restart on the SAME
    checkpoint resumes after the last committed batch (committed work
    is never re-read), the uncommitted batch replays, and the final
    sink holds exactly one row per key — exactly-once contents from
    at-least-once delivery + idempotent merge."""
    import json

    from pyspark.errors import StreamingQueryException
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    src = tmp_path / "src"
    src.mkdir()
    # three files -> three micro-batches (maxFilesPerTrigger=1);
    # key "u1" is updated in every batch, u2/u3 appear once
    batches = [
        [{"user_id": "u1", "seq": 1, "v": "a"},
         {"user_id": "u2", "seq": 1, "v": "b"}],
        [{"user_id": "u1", "seq": 2, "v": "c"}],
        [{"user_id": "u1", "seq": 3, "v": "d"},
         {"user_id": "u3", "seq": 1, "v": "e"}],
    ]
    for i, rows in enumerate(batches):
        with open(src / f"f{i}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    schema = StructType([StructField("user_id", StringType()),
                         StructField("seq", LongType()),
                         StructField("v", StringType())])
    out = str(tmp_path / "merged")
    ckpt = str(tmp_path / "ck")

    def stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).json(str(src)))

    # run 1: merge batch 0, then die before batch 1 commits
    inner = se.keep_latest_merge(out, key="user_id", order_col="seq")

    def crashing(batch, epoch):
        if epoch >= 1:
            raise RuntimeError("injected crash between micro-batches")
        inner(batch, epoch)

    q = (stream().writeStream.foreachBatch(crashing)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination()
        raise AssertionError("query should have died on the injected crash")
    except StreamingQueryException:
        pass
    assert spark.read.parquet(out).count() == 2  # batch 0 committed

    # run 2: same checkpoint, no crash — must resume at batch 1
    # (replaying the uncommitted one), never re-reading batch 0
    epochs = []

    def recording(batch, epoch):
        epochs.append(epoch)
        inner(batch, epoch)

    q2 = (stream().writeStream.foreachBatch(recording)
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination()
    assert 0 not in epochs and len(epochs) >= 2

    got = {r["user_id"]: (r["seq"], r["v"])
           for r in spark.read.parquet(out).collect()}
    assert got == {"u1": (3, "d"), "u2": (1, "b"), "u3": (1, "e")}
    assert spark.read.parquet(out).count() == 3  # no dup rows


def test_stream_stream_join_equals_batch_self_join(spark, sf_dir):
    """Watermarked stream-stream interval join == batch self-join
    (Kappa parity for two-sided join state)."""
    s1 = se.read_events_stream(spark, sf_dir)
    s2 = se.read_events_stream(spark, sf_dir)
    j = se.click_purchase_join(
        s1.where(F.col("event_type") == "click"),
        s2.where(F.col("event_type") == "purchase"))
    got = se.run_available_now(j.select("user_id", "c_id", "p_id"),
                               output_mode="append")
    e = read_events(spark, sf_dir)
    c = e.where("event_type = 'click'") \
        .select("user_id", F.col("ts").alias("c_ts"),
                F.col("event_id").alias("c_id"))
    p = e.where("event_type = 'purchase'") \
        .select(F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
                F.col("event_id").alias("p_id"))
    want = c.join(p, (F.col("user_id") == F.col("p_user"))
                  & (F.col("p_ts") >= F.col("c_ts"))
                  & (F.col("p_ts") <= F.col("c_ts")
                     + F.expr("interval 30 minutes"))) \
        .select("user_id", "c_id", "p_id")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert want.count() > 0


def test_keep_latest_merge_partitioned_scoped_rewrite(spark, tmp_path):
    """The scale form of the streaming MERGE: a micro-batch touching
    one key must rewrite ONLY that key's hash-bucket partition —
    every other bucket's files stay byte-identical on disk — while
    keep-latest semantics hold across the whole sink."""
    import glob
    import os

    out = str(tmp_path / "sink")
    schema = "user_id long, seq long, v string"
    merge = se.keep_latest_merge_partitioned(out, "user_id", "seq",
                                             n_buckets=8)
    merge(spark.createDataFrame(
        [(u, 1, "a") for u in range(40)], schema), 0)

    def snapshot():
        return {p: (os.path.getmtime(p), os.path.getsize(p))
                for p in glob.glob(f"{out}/_bucket=*/*.parquet")}

    before = snapshot()
    assert len({os.path.dirname(p) for p in before}) == 8  # all buckets

    merge(spark.createDataFrame([(7, 2, "b")], schema), 1)
    after = snapshot()

    [tb] = [r[0] for r in spark.createDataFrame([(7,)], "user_id long")
            .select(F.pmod(F.xxhash64("user_id"), F.lit(8))).collect()]
    untouched = [p for p in before if f"_bucket={tb}" + os.sep not in p]
    assert untouched  # sanity: other buckets exist
    for p in untouched:
        assert p in after and after[p] == before[p], p

    final = {r["user_id"]: (r["seq"], r["v"])
             for r in spark.read.parquet(out)
             .select("user_id", "seq", "v").collect()}
    assert final[7] == (2, "b")
    assert all(final[u] == (1, "a") for u in range(40) if u != 7)
    # idempotence: replaying the batch changes nothing
    merge(spark.createDataFrame([(7, 2, "b")], schema), 1)
    again = {r["user_id"]: (r["seq"], r["v"])
             for r in spark.read.parquet(out)
             .select("user_id", "seq", "v").collect()}
    assert again == final


def test_event_time_timeout_evicts_idle_sessions(spark, tmp_path):
    """Emit-on-timeout discipline: sessions close when the WATERMARK
    passes last_event + gap, driven across restarts by checkpointed
    watermark state. Three sequential availableNow runs on one
    checkpoint: (1) seed users 1/2, no emissions; (2) a 2h-later
    event advances the watermark; (3) the next batch's restored
    watermark fires the event-time timeouts -> exactly the idle
    users' sessions are emitted and their state evicted."""
    import json

    from pyspark.sql.types import (LongType, StructField, StructType,
                                   TimestampType)

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "ck_timeout")
    base = "2024-01-01T00:0{m}:00.000Z"

    schema = StructType([StructField("user_id", LongType()),
                         StructField("ts", TimestampType())])

    def write_file(name, rows):
        with open(src / name, "w") as f:
            for uid, ts in rows:
                f.write(json.dumps({"user_id": uid, "ts": ts}) + "\n")

    def run():
        s = (spark.readStream.schema(schema)
             .option("maxFilesPerTrigger", 1).json(str(src)))
        q = (se.idle_session_timeouts(s, gap_minutes=30)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    def emitted():
        # fresh reader each time: a parquet DataFrame pins its file
        # listing at creation, so reuse would miss later sink commits
        return spark.read.schema(
            "user_id long, n_events long, last_ts timestamp").parquet(out)

    write_file("a.json", [(1, base.format(m=0)), (1, base.format(m=5)),
                          (2, base.format(m=1))])
    run()
    assert emitted().count() == 0  # nothing times out within one batch

    # 2h later: the watermark moves to 01:00 (2h - 1h delay) after this
    # file's batch; availableNow then runs a trailing no-data batch in
    # which 01:00 > 00:05+30min fires the timeouts for users 1 and 2.
    # User 99 (timeout 02:30) stays live. Run a third file anyway so
    # the emissions don't depend on the trailing-batch behavior.
    write_file("b.json", [(99, "2024-01-01T02:00:00.000Z")])
    run()
    write_file("c.json", [(98, "2024-01-01T02:01:00.000Z")])
    run()
    got = {r["user_id"]: r["n_events"] for r in emitted().collect()}
    assert got == {1: 2, 2: 1}


def test_watermark_drops_late_rows_with_accounting(spark, tmp_path):
    """Late-data discipline: a row older than the checkpointed
    watermark is dropped from the windowed aggregation AND the drop is
    visible in the progress metrics (numRowsDroppedByWatermark) — the
    operational signal a 100 TB pipeline alerts on instead of
    silently undercounting."""
    import json

    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType, TimestampType)

    src = tmp_path / "late_src"
    src.mkdir()
    ckpt = str(tmp_path / "ck_late")

    schema = StructType([StructField("user_id", LongType()),
                         StructField("event_type", StringType()),
                         StructField("value", DoubleType()),
                         StructField("ts", TimestampType())])

    def write_file(name, rows):
        with open(src / name, "w") as f:
            for uid, ts in rows:
                f.write(json.dumps({"user_id": uid, "event_type": "c",
                                    "value": 1.0, "ts": ts}) + "\n")

    def run():
        s = (spark.readStream.schema(schema)
             .option("maxFilesPerTrigger", 1).json(str(src)))
        q = (se.tumbling_counts(s)
             .writeStream.format("noop").outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return q.recentProgress

    write_file("a.json", [(1, "2024-01-01T00:05:00.000Z"),
                          (2, "2024-01-01T00:10:00.000Z")])
    p1 = run()
    # 3h later -> watermark after this batch = 02:00
    write_file("b.json", [(3, "2024-01-01T03:00:00.000Z")])
    p2 = run()
    # late row at 00:07, far behind the 02:00 watermark -> dropped
    write_file("c.json", [(4, "2024-01-01T00:07:00.000Z")])
    p3 = run()

    def dropped(progress):
        return sum(op.get("numRowsDroppedByWatermark", 0)
                   for pr in progress for op in pr["stateOperators"])

    assert dropped(p1) == 0 and dropped(p2) == 0
    assert dropped(p3) >= 1


def test_rocksdb_state_store_parity(spark, sf_dir):
    """State-store backend is a scale dial, not a semantics dial: the
    same windowed aggregation drained under the RocksDB provider
    (state spills to local disk — the backend for state far beyond
    executor heap) equals the default HDFS-backed in-memory provider's
    result row-for-row."""
    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = ("org.apache.spark.sql.execution.streaming."
             "state.RocksDBStateStoreProvider")
    default_rows = _rows(se.run_available_now(
        se.tumbling_counts(se.read_events_stream(spark, sf_dir))),
        ["ws", "event_type", "n", "sum_value"])
    old = spark.conf.get(key, None)
    spark.conf.set(key, rocks)
    try:
        rocks_rows = _rows(se.run_available_now(
            se.tumbling_counts(se.read_events_stream(spark, sf_dir))),
            ["ws", "event_type", "n", "sum_value"])
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert rocks_rows == default_rows and len(rocks_rows) > 0


def test_keep_latest_merge_corrupt_sink_raises(spark, tmp_path):
    """A corrupt (unreadable) sink must FAIL the micro-batch, never be
    treated as 'first batch' — that silent fallback would overwrite
    the sink (or its touched buckets) with only the batch's rows."""
    import pytest

    # a directory containing a torn non-parquet data file
    bad = tmp_path / "bad_sink"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")
    batch = spark.createDataFrame([(1, 10)], "k long, seq long")
    with pytest.raises(Exception) as ei:
        se.keep_latest_merge(str(bad), "k", "seq")(batch, 0)
    assert "first batch" not in str(ei.value)
    with pytest.raises(Exception):
        se.keep_latest_merge_partitioned(str(bad), "k", "seq")(batch, 0)
    # the corrupt file is still there — nothing overwrote it
    assert (bad / "part-00000.parquet").read_bytes() == b"not a parquet file"


def test_keep_latest_merge_empty_dir_is_first_batch(spark, tmp_path):
    """An EXISTING but never-committed sink dir (what a crashed first
    write leaves) must recover as first-batch, not brick the stream."""
    empty = tmp_path / "empty_sink"
    empty.mkdir()
    batch = spark.createDataFrame([(1, 10), (2, 5)], "k long, seq long")
    se.keep_latest_merge(str(empty), "k", "seq")(batch, 0)
    assert spark.read.parquet(str(empty)).count() == 2


def test_streaming_minhash_pairs_kappa_parity(spark, sf_dir, tmp_path):
    """The drained streaming near-dup pair set must equal the batch
    minhash_lsh_pairs answer exactly — candidate generation is
    order-independent and the skew cap is re-applied on final bucket
    sizes at read time (streaming/neardup.py docstring)."""
    from rag_vector_database_spark.operators import dedup
    from rag_vector_database_spark.streaming import neardup

    in_dir = str(tmp_path / "in")
    index = str(tmp_path / "idx")
    cands = str(tmp_path / "cand")
    ckpt = str(tmp_path / "ck")
    mh = dict(shingle_n=2, n_hashes=12, n_bands=4, max_bucket=64)
    neardup.write_doc_slices(spark, sf_dir, in_dir, n_slices=3)
    neardup.run_docs_stream(spark, in_dir, index, cands, ckpt, **mh)
    got = _rows(neardup.final_pairs(spark, index, cands,
                                    jaccard_threshold=0.5, max_bucket=64),
                ["id_a", "id_b", "jaccard"])
    want = _rows(dedup.minhash_lsh_pairs(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        shingle_n=2, n_hashes=12, n_bands=4,
        jaccard_threshold=0.5, max_bucket=64),
        ["id_a", "id_b", "jaccard"])
    assert got == want
    assert len(got) > 0


def test_streaming_minhash_replayed_batch_changes_nothing(spark, sf_dir,
                                                          tmp_path):
    """foreachBatch is at-least-once: re-running one batch's merge (a
    crash-replay) appends duplicate index/candidate rows, but the
    read-side dedup keeps the final answer identical."""
    from rag_vector_database_spark.streaming import neardup

    in_dir = str(tmp_path / "in")
    index = str(tmp_path / "idx")
    cands = str(tmp_path / "cand")
    ckpt = str(tmp_path / "ck")
    mh = dict(shingle_n=2, n_hashes=12, n_bands=4, max_bucket=64)
    neardup.write_doc_slices(spark, sf_dir, in_dir, n_slices=3)
    neardup.run_docs_stream(spark, in_dir, index, cands, ckpt, **mh)
    before = _rows(neardup.final_pairs(spark, index, cands,
                                       jaccard_threshold=0.5,
                                       max_bucket=64),
                   ["id_a", "id_b", "jaccard"])
    # replay: run the slice-0 batch through the merge again by hand
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("doc_id") % 3 == 0))
    neardup.minhash_index_merge(index, cands, **mh)(docs, 999)
    after = _rows(neardup.final_pairs(spark, index, cands,
                                      jaccard_threshold=0.5,
                                      max_bucket=64),
                  ["id_a", "id_b", "jaccard"])
    assert after == before


def test_streaming_minhash_order_independence_random_splits(spark, sf_dir,
                                                            tmp_path):
    """The order-independence claim, adversarially: for RANDOM batch
    partitions of the corpus (any number of batches, any assignment,
    any processing order), driving the per-batch merge by hand yields
    the same final pair set as the batch operator. Hypothesis picks
    the partition; the stream machinery is bypassed so each example
    costs merges only."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from rag_vector_database_spark.operators import dedup
    from rag_vector_database_spark.streaming import neardup

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("doc_id") < 120).localCheckpoint())
    mh = dict(shingle_n=2, n_hashes=12, n_bands=4, max_bucket=8)
    want = _rows(dedup.minhash_lsh_pairs(
        docs, shingle_n=2, n_hashes=12, n_bands=4,
        jaccard_threshold=0.5, max_bucket=8),
        ["id_a", "id_b", "jaccard"])
    assert len(want) > 0
    counter = [0]

    @settings(max_examples=4, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(st.integers(0, 3), min_size=120, max_size=120),
           st.permutations(list(range(4))))
    def prop(assignment, order):
        counter[0] += 1
        root = tmp_path / f"prop{counter[0]}"
        index, cands = str(root / "idx"), str(root / "cand")
        amap = {i: b for i, b in enumerate(assignment)}
        merge = neardup.minhash_index_merge(index, cands, **mh)
        udf_map = F.udf(lambda d: amap[d], "int")
        tagged = docs.withColumn("_b", udf_map("doc_id")).localCheckpoint()
        for epoch, b in enumerate(order):
            batch = tagged.where(F.col("_b") == b).drop("_b")
            if batch.take(1):
                merge(batch, epoch)
        got = _rows(neardup.final_pairs(spark, index, cands,
                                        jaccard_threshold=0.5,
                                        max_bucket=8),
                    ["id_a", "id_b", "jaccard"])
        assert got == want

    prop()


def test_read_parquet_stream_dir_of_parts(spark, tmp_path):
    """The production layout: a table DIRECTORY receiving part files
    streams one file per micro-batch; the drained content equals the
    batch read. (The single-file branch is exercised end-to-end by
    streaming_ivf_append's parity gate.)"""
    from rag_vector_database_spark.streaming import events as SE

    tdir = tmp_path / "embeddings.parquet"
    tdir.mkdir()
    spark.createDataFrame([(i, [float(i)] * 4) for i in range(6)],
                          "vec_id long, embedding array<float>") \
        .where("vec_id < 3").coalesce(1) \
        .write.mode("overwrite").parquet(str(tdir / "p0"))
    spark.createDataFrame([(i, [float(i)] * 4) for i in range(6)],
                          "vec_id long, embedding array<float>") \
        .where("vec_id >= 3").coalesce(1) \
        .write.mode("overwrite").parquet(str(tdir / "p1"))
    # nested dirs aren't part files; point the helper at a dir whose
    # immediate children are the parquet files
    import shutil
    for sub in ("p0", "p1"):
        src = next((tdir / sub).glob("*.parquet"))
        shutil.move(str(src), str(tdir / f"{sub}.parquet"))
        shutil.rmtree(str(tdir / sub))

    batches = []
    stream = SE.read_parquet_stream(spark, str(tmp_path), "embeddings",
                                    max_files_per_trigger=1)
    q = (stream.writeStream
         .foreachBatch(lambda b, e: batches.append((e, b.count())))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert len(batches) == 2          # one micro-batch per part file
    assert sum(n for _, n in batches) == 6


def test_streaming_lifecycle_pipeline_kappa_parity(spark, sf_dir):
    """The streaming flagship's Kappa gate: the drained, retraction-
    corrected IVF store must equal the batch from-scratch build —
    pairs via batch minhash_lsh_pairs, CC losers dropped, survivors
    assigned against the same frozen quantizer. (The DuckDB oracle
    checks the same contract externally; this is the in-Spark twin,
    plus a run-twice idempotency check.)"""
    from rag_vector_database_spark.operators import clustering as CL
    from rag_vector_database_spark.operators import dedup
    from rag_vector_database_spark.plans.registry import (
        _MH, q_streaming_lifecycle_pipeline)

    got = _rows(q_streaming_lifecycle_pipeline(spark, sf_dir),
                ["vec_id", "cluster"])

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = dedup.minhash_lsh_pairs(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        shingle_n=_MH["shingle_n"], n_hashes=_MH["n_hashes"],
        n_bands=_MH["n_bands"], jaccard_threshold=_MH["threshold"],
        max_bucket=_MH["max_bucket"])
    losers = (dedup.connected_components(pairs)
              .where(F.col("id") != F.col("cluster_id"))
              .select(F.col("id").alias("vec_id")))
    best = CL._argmin_centroid(
        CL.kmeans_centroids(emb, k=5, iters=2), "embedding", 6)
    want = _rows(
        emb.join(losers, "vec_id", "left_anti")
        .select("vec_id", best.getField("cl").cast("long")
                .alias("cluster")),
        ["vec_id", "cluster"])
    assert got == want
    assert 0 < len(got) < emb.count()  # retraction actually dropped dups

    again = _rows(q_streaming_lifecycle_pipeline(spark, sf_dir),
                  ["vec_id", "cluster"])
    assert again == got  # re-run rebuilds, never double-appends


def test_builtin_agg_late_row_filter_is_run_scoped(spark, tmp_path):
    """The empirical pin behind q_streaming_late_data_audit's design:
    on this Spark (4.1), the windowed-aggregation late-row filter uses
    the watermark loaded at QUERY START — a late row arriving in a
    later micro-batch of the SAME run is accepted even though the
    in-run watermark has advanced past its window, while the same row
    arriving after a restart (watermark reloaded from the checkpoint)
    is dropped. Both directions asserted, so a Spark upgrade that
    changes either flips this test and the audit's docstring gets
    revisited."""
    import glob
    import os
    import shutil

    base = str(tmp_path)
    os.makedirs(base + "/in")

    def write(i, rows):
        df = (spark.createDataFrame(rows, "id int, ts string")
              .withColumn("ts", F.col("ts").cast("timestamp")))
        stage = f"{base}/stage{i}"
        df.coalesce(1).write.parquet(stage)
        part = glob.glob(stage + "/part-*.parquet")[0]
        dst = f"{base}/in/b{i}.parquet"
        os.replace(part, dst)
        shutil.rmtree(stage)
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)

    def run():
        schema = spark.read.parquet(f"{base}/in/b0.parquet").schema
        src = (spark.readStream.schema(schema).format("parquet")
               .option("maxFilesPerTrigger", 1).load(f"{base}/in"))
        agg = (src.withWatermark("ts", "60 seconds")
               .groupBy(F.window("ts", "1 hour").alias("w"))
               .agg(F.count(F.lit(1)).alias("n")))
        q = (agg.writeStream.format("noop").outputMode("update")
             .option("checkpointLocation", base + "/ck")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return q.recentProgress

    def dropped(ps):
        return sum(op.get("numRowsDroppedByWatermark", 0)
                   for p in ps for op in p["stateOperators"])

    write(0, [(1, "2024-01-01 10:00:00")])
    # same run: batch 1's watermark is 09:59 (visible in progress) but
    # the 01:00:05 row — window end 02:00, far behind it — is accepted
    write(1, [(2, "2024-01-01 01:00:05"), (3, "2024-01-01 10:30:00")])
    p1 = run()
    wm_batch1 = [p["eventTime"].get("watermark") for p in p1
                 if p["batchId"] == 1]
    assert wm_batch1 == ["2024-01-01T09:59:00.000Z"]
    assert dropped(p1) == 0
    # restart: the same-shaped late row is now dropped (watermark came
    # from the checkpoint at query start)
    write(2, [(4, "2024-01-01 01:00:06")])
    p2 = run()
    assert dropped(p2) >= 1


def test_late_audit_reconciles_and_drops(spark, sf_dir):
    """q_streaming_late_data_audit at sf0.001: the ledger reconciles
    exactly (accepted + dropped == total per window and in sum) and
    the straggler batch really loses rows to the lateness bound."""
    res = registry.queries()["streaming_late_data_audit"](
        spark, sf_dir).toPandas()
    ev_n = read_events(spark, sf_dir).count()
    assert res.n_total.sum() == ev_n
    assert (res.n_accepted + res.n_dropped_late == res.n_total).all()
    assert (res.n_accepted >= 0).all() and (res.n_dropped_late >= 0).all()
    assert res.n_dropped_late.sum() > 0
    # drops can only exist in windows that ended before the split
    # (stragglers are first-half rows); every second-half window clean
    late_ws = res[res.n_dropped_late > 0].ws
    assert (late_ws < "2024-01-16").all()


def test_late_audit_replayed_epoch_is_idempotent(spark, tmp_path):
    """Crash-replay contract of the sink-enforced protocol: re-running
    an epoch AFTER its state commit (the at-least-once worst case —
    output written, CURRENT repointed, checkpoint commit lost) leaves
    byte-identical accepted counts, because epoch N's watermark is a
    function of epochs < N only and the output is epoch-keyed
    overwrite."""
    import os

    state = str(tmp_path / "state")
    outp = str(tmp_path / "out")
    os.makedirs(state)
    os.makedirs(outp)
    mk = lambda rows: (spark.createDataFrame(rows, "id int, ts string")
                       .withColumn("ts", F.col("ts").cast("timestamp")))
    b0 = mk([(1, "2024-01-01 10:00:00"), (2, "2024-01-01 09:10:00")])
    b1 = mk([(3, "2024-01-01 01:00:05"), (4, "2024-01-01 10:30:00")])
    delay = 1_801 * 1_000_000
    se.late_audit_process_batch(b0, 0, state, outp, delay)
    se.late_audit_process_batch(b1, 1, state, outp, delay)
    first = sorted(map(tuple, spark.read.parquet(outp + "/ep1").collect()))
    # wm after epoch 0 = 10:00 - 30m1s -> the 01:00:05 row (window end
    # 02:00) is rejected, the 10:30 row survives (wh = epoch-hour
    # index; 2024-01-01 00:00Z is hour 473352)
    h0 = 1704067200 // 3600
    assert first == [(h0 + 10, 1)]
    # replay epoch 1 (same batch, state already contains epoch 1's max)
    se.late_audit_process_batch(b1, 1, state, outp, delay)
    again = sorted(map(tuple, spark.read.parquet(outp + "/ep1").collect()))
    assert again == first
    # and epoch 0's output is untouched by the replays
    ep0 = sorted(map(tuple, spark.read.parquet(outp + "/ep0").collect()))
    assert ep0 == [(h0 + 9, 1), (h0 + 10, 1)]


def test_late_audit_corrupted_store_raises(tmp_path):
    """A missing CURRENT means fresh state ({}); but a CURRENT that
    names an unreadable ledger is a corrupted store and MUST raise —
    silently returning {} would reset the watermark to
    accept-everything, under-reporting drops in a MUST-drop audit
    (r09 advisor finding)."""
    import os

    import pytest

    state = str(tmp_path / "state")
    os.makedirs(state)
    assert se.late_audit_epoch_maxes(state) == {}  # fresh store
    with open(os.path.join(state, "CURRENT"), "w") as f:
        f.write("epoch_0_deadbeef")  # names a file that doesn't exist
    with pytest.raises(RuntimeError, match="corrupted"):
        se.late_audit_epoch_maxes(state)
    # a TORN ledger (file exists but is truncated mid-write — invalid
    # JSON) is the same corrupted-store condition and must raise the
    # same diagnostic, not leak a bare JSONDecodeError (r10 advisor)
    with open(os.path.join(state, "epoch_0_deadbeef"), "w") as f:
        f.write('{"0": 123')  # truncated
    with pytest.raises(RuntimeError, match="corrupted"):
        se.late_audit_epoch_maxes(state)

"""Upsert keep-latest and deferred-retry semantics (SURVEY §2 #31-32)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_vector_database_spark.operators import upsert as U


def test_upsert_keeps_latest(spark):
    existing = spark.createDataFrame(
        [(1, "old-1", 10), (2, "old-2", 10), (3, "old-3", 10)],
        ["id", "payload", "version"])
    updates = spark.createDataFrame(
        [(2, "new-2", 20), (3, "stale-3", 5), (4, "new-4", 20)],
        ["id", "payload", "version"])
    out = {r["id"]: r["payload"]
           for r in U.upsert(existing, updates, "id", "version").collect()}
    assert out == {1: "old-1", 2: "new-2", 3: "old-3", 4: "new-4"}


def test_upsert_tie_prefers_update(spark):
    existing = spark.createDataFrame([(1, "old", 10)], ["id", "payload", "version"])
    updates = spark.createDataFrame([(1, "new", 10)], ["id", "payload", "version"])
    out = U.upsert(existing, updates, "id", "version").collect()
    assert out[0]["payload"] == "new"


def test_retry_failed(spark):
    df = spark.createDataFrame(
        [(1, "FETCHED"), (2, "NETWORK_ERROR"), (3, "DISABLED"),
         (4, "UNKNOWN_ERROR")], ["id", "status"])

    def fetch(failed):
        # pass 2 succeeds for id 2, fails permanently for id 4
        return failed.withColumn(
            "status",
            F.when(F.col("id") == 2, F.lit("FETCHED"))
             .otherwise(F.lit("NO_TRANSCRIPT_FOUND")))

    out = {r["id"]: r["status"] for r in U.retry_failed(df, fetch).collect()}
    assert out == {1: "FETCHED", 2: "FETCHED", 3: "DISABLED",
                   4: "NO_TRANSCRIPT_FOUND"}
    # statuses are data: permanent failures never reach the fetcher
    assert out[3] == "DISABLED"


def test_session_log(spark):
    from rag_vector_database_spark.operators.session_log import SessionLog
    log = SessionLog(spark, "s1")
    log.append("new_query", "q1", "ok", 5, "a1")
    log.append("follow_up", "q2", "cached", 5, "a2")
    assert log.history() == [("q1", "a1"), ("q2", "a2")]
    assert log.history(last_n=1) == [("q2", "a2")]
    nested = log.nested_log().collect()[0]
    assert nested["n_turns"] == 2
    assert [t["turn"] for t in nested["conversation_turns"]] == [1, 2]


def test_pdf_extract_stub(spark, tmp_path):
    (tmp_path / "a.pdf").write_bytes(b"%PDF fake content " * 100)
    from rag_vector_database_spark.sources import readers
    bins = readers.read_binaries(spark, str(tmp_path))
    out = readers.extract_pdf_text(bins).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pages"] == 1 and r["pdf_title"].startswith("doc-")
    assert "%PDF" in r["text"]

"""observe()/CollectMetrics: metrics ride the query's own execution."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_vector_database_spark.operators import observe as obs_ops


def test_observation_matches_explicit_aggregation(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    observed, obs = obs_ops.with_observation(
        d, obs_ops.ingest_metrics("text"))
    observed.write.mode("overwrite").format("noop").save()  # one action
    got = obs.get
    want = d.agg(*obs_ops.ingest_metrics("text")).first().asDict()
    assert got == want
    assert got["n_rows"] > 0


def test_observation_is_in_plan_not_a_second_job(spark, sf_dir):
    """The metrics must be a CollectMetrics node inside the SAME plan
    (no extra scan): assert the node is present and that obs.get
    becomes available from the single action alone."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    observed, obs = obs_ops.with_observation(
        d, [F.count(F.lit(1)).alias("n")])
    plan = observed._jdf.queryExecution().executedPlan().toString()
    assert "CollectMetrics" in plan
    n_result = observed.count()
    assert obs.get["n"] == n_result


def test_observation_streaming_micro_batch_metrics(spark, sf_dir):
    """Same observe definition in a STREAM: per-micro-batch metrics
    surface in progress.observedMetrics — one metric definition for
    batch and streaming."""
    from rag_vector_database_spark.streaming import events as se

    stream = se.read_events_stream(spark, sf_dir)
    observed = stream.observe(
        "batch_health",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .alias("n_null_value"))
    q = (observed.writeStream.format("noop")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    metrics = [pr["observedMetrics"]["batch_health"]
               for pr in q.recentProgress
               if pr.get("observedMetrics", {}).get("batch_health")]
    assert metrics  # at least one micro-batch reported
    total = sum(m["n_rows"] for m in metrics)
    batch_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == batch_n

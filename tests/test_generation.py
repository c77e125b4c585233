"""Generation surface (#62) + JSON sinks (#10/#11)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from rag_vector_database_spark.operators import generation, ingest


def test_prompt_assembly_and_stub_determinism(spark):
    df = spark.createDataFrame(
        [("ctx A", "hist", "why?"), ("ctx B", None, "how?")],
        "context string, history string, question string")
    out = df.select(
        generation.assemble_prompt(
            F.col("context"), F.col("history"), F.col("question"))
        .alias("prompt"))
    prompts = [r["prompt"] for r in out.collect()]
    assert prompts[0] == ("Answer using ONLY the context below.\n\n"
                          "Context:\nctx A\n\nChat history:\nhist\n\n"
                          "Question: why?\nAnswer:")
    # null history -> empty section, not a null prompt
    assert "Chat history:\n\n" in prompts[1]

    ans = out.select(generation.answer_stub(F.col("prompt")).alias("a"))
    a1 = [r["a"] for r in ans.collect()]
    a2 = [r["a"] for r in ans.collect()]
    assert a1 == a2 and all(a.startswith("ANSWER[") for a in a1)


def test_generate_with_backend(spark):
    df = spark.createDataFrame([("p1",), ("p2",)], "prompt string")

    def backend(prompts: list[str]) -> list[str]:
        return [f"echo:{p}" for p in prompts]

    out = generation.generate_with(df, backend)
    got = {r["prompt"]: r["ai_response"] for r in out.collect()}
    assert got == {"p1": "echo:p1", "p2": "echo:p2"}


def test_jsonl_append_sink_unions_runs(spark):
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/corpus"
        a = spark.range(3).select(F.col("id"), F.lit("runA").alias("run"))
        b = spark.range(2).select(F.col("id"), F.lit("runB").alias("run"))
        ingest.append_jsonl(a, path)
        ingest.append_jsonl(b, path)
        back = spark.read.json(path)
        assert back.count() == 5
        assert back.where(F.col("run") == "runB").count() == 2


def test_grouped_json_sink_prunes_on_key(spark):
    with tempfile.TemporaryDirectory() as d:
        df = spark.range(10).select(
            F.col("id"),
            F.concat(F.lit("ch"), (F.col("id") % 2).cast("string"))
             .alias("channel_folder"))
        ingest.write_grouped_json(df, f"{d}/videos", "channel_folder")
        back = (spark.read.json(f"{d}/videos")
                .where(F.col("channel_folder") == "ch1"))
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert back.count() == 5

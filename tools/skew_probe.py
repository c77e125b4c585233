"""Hot-key probe for the round-6 spill-safe fold rewrites.

The r06 rewrites replaced collect_list partial folds (which buffer a
whole (group, salt) sub-group in ONE aggregation buffer) with
row_number windows (external, disk-spilling sorts) in
``sampling.salted_top_per_group`` and ``retrieval.knn_batch_topk``.
The 10x re-sweeps that accompanied the rewrite ran on UNIFORM data;
this probe measures the exact condition the rewrite was built for — a
deliberately skewed corpus where ONE key holds ~50% of all rows:

- ``domain_cap``: documents replicated Nx with half of every copy's
  rows reassigned to a single hot domain (``hot.example.com``). The
  hot domain therefore grows linearly with the corpus while the other
  19 domains keep their uniform share — at 30x the hot domain holds
  75k rows vs ~4k per cold domain.
- ``knn_batch_topk``: corpus replicated Nx (vec_id shifted, vectors
  kept — kNN cost is value-independent), 8 query vectors, and a
  ``pair_filter`` that routes EVERY corpus row to query 0 but only a
  1/8 id-slice to each other query: query 0 scores ~53% of all scored
  pairs, i.e. one hot (query, salt) family.

Reported per kernel: wall seconds at 1x/10x/30x (min of reps) and the
time-ratio per data unit, the same estimator SCALE.md uses. A
spill-safe phase 1 should scale near-linearly in hot-key rows; the
pre-rewrite fold shape would instead grow one task's memory linearly
until it OOMs.

Usage: python tools/skew_probe.py [factors...]   (default: 1 10 30)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from rag_vector_database_spark.operators import retrieval, sampling

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000


def skewed_documents(spark, factor: int):
    base = spark.read.parquet(f"{SRC}/documents.parquet") \
        .select("doc_id", "source", "n_chars")
    copies = spark.range(factor).select(F.col("id").alias("copy"))
    return (base.crossJoin(copies)
            .select((F.col("doc_id") + F.col("copy") * STRIDE)
                    .alias("doc_id"),
                    F.when(F.col("doc_id") % 2 == 0,
                           F.lit("hot.example.com"))
                    .otherwise(F.col("source")).alias("source"),
                    "n_chars"))


def skewed_knn_inputs(spark, factor: int):
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet") \
        .select("vec_id", "embedding")
    queries = (emb.where(F.col("vec_id") < 8)
               .select(F.col("vec_id").alias("qid"),
                       F.col("embedding").alias("qv")))
    copies = spark.range(factor).select(F.col("id").alias("copy"))
    corpus = (emb.where(F.col("vec_id") >= 8).crossJoin(copies)
              .select((F.col("vec_id") + F.col("copy") * STRIDE)
                      .alias("vec_id"), "embedding"))
    # query 0 sees every corpus row; the others a 1/8 id-slice each ->
    # query 0 holds ~53% of all scored pairs (the hot key).
    pair_filter = (F.col("qid") == 0) | (F.col("vec_id") % 8 == F.col("qid"))
    return corpus, queries, pair_filter


def timed(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main(factors):
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.showConsoleProgress", "false")
             .appName("skew_probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out = {"domain_cap": {}, "knn_batch": {}, "hot_share": {}}
    for f in factors:
        docs = skewed_documents(spark, f)
        # materialize the synthetic input once so the timed section
        # measures the kernel, not the generator
        docs = docs.persist()
        n = docs.count()
        hot = docs.where(F.col("source") == "hot.example.com").count()
        out["hot_share"][f"{f}x_docs"] = round(hot / n, 3)
        out["domain_cap"][f"{f}x"] = timed(
            lambda: sampling.domain_cap(docs, cap=15).count())
        docs.unpersist()

        corpus, queries, pf = skewed_knn_inputs(spark, f)
        corpus = corpus.persist()
        corpus.count()
        out["knn_batch"][f"{f}x"] = timed(
            lambda: retrieval.knn_batch_topk(
                corpus, queries, 5, pair_filter=pf).count())
        corpus.unpersist()
    for kernel in ("domain_cap", "knn_batch"):
        r = out[kernel]
        lo, hi = f"{factors[0]}x", f"{factors[-1]}x"
        if lo in r and hi in r and r[lo] > 0:
            ratio = r[hi] / r[lo]
            out[kernel]["time_ratio"] = round(ratio, 2)
            out[kernel]["per_unit"] = round(
                ratio / (factors[-1] / factors[0]), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1, 10, 30])

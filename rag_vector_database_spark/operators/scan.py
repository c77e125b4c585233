"""Scan-width plumbing shared by compute-heavy operators.

A one-split parquet (anything under ``spark.sql.files.
maxPartitionBytes``) scans as a SINGLE partition, so any expensive
per-row work layered on it runs in one task no matter how many cores
the cluster has. The gate here widens exactly those scans and nothing
else: a corpus that is already wider than the core count is never
repartitioned, so at 100 TB (thousands of splits) the gate is a no-op
and adds zero shuffle.

WHERE THE GATE PAYS (measured at sf0.1, local[32]): only where
per-row cost dwarfs the exchange + 32-task scheduling overhead
(~0.5-1 s per job on small inputs):

- Python ``mapInPandas`` kernels (sources.multimodal): 2-4x faster —
  a single Python worker was the whole pipeline's throughput.
- Tokenize-into-persisted-table paths (operators.dedup): the
  exchange cost is paid once into a table with several consumers.

WHERE IT DOES NOT (and is deliberately NOT applied): JVM
whole-stage-codegen paths over corpus-sized-but-small inputs —
fingerprint/md5 (exact_dedup +0.4 s), BM25 tokenize (+0.8 s), the
k-means/PQ iteration loops and per-row scorings (+1 s: multiple
actions each re-pay exchange + task overhead against tens of ms of
actual compute). Re-measure before adding a new call site.
"""

from pyspark.sql import DataFrame


def estimated_scan_partitions(df: DataFrame) -> int:
    """Scan width from Catalyst plan statistics — a few ms, NO job and
    no RDD materialization (``df.rdd`` costs ~1 s of plan conversion
    just to read a partition count). sizeInBytes / maxPartitionBytes is
    how the file source itself sizes splits, so the estimate matches
    what the scan would actually do."""
    spark = df.sparkSession
    size = int(str(df._jdf.queryExecution().optimizedPlan().stats()
                   .sizeInBytes()))
    max_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes",
                                   str(128 * 1024 * 1024)).rstrip("b"))
    return max(1, -(-size // max_split))


def widen_narrow_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the core count IFF its scan is narrower —
    the round-robin exchange costs one pass over a by-definition-small
    input and buys full parallelism for every downstream per-row
    kernel. Values are unchanged (per-row transforms are partition-
    independent); callers whose downstream aggregates DOUBLES must
    note that partial-sum order shifts with partitioning — every such
    caller in this repo rounds aggregate results to a fixed number of
    digits, the same contract that already lets the DuckDB oracle (its
    own summation order) hash-match."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if estimated_scan_partitions(df) < par:
        return df.repartition(par)
    return df

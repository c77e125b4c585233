"""Scan-width estimation shared by operators/ and sources/.

Layer-neutral home for the narrow-scan gate: both ``operators.scan``
(tokenize-into-table paths) and ``sources.multimodal`` (mapInPandas
blob kernels) need it, and sources may not import an operator module —
so the single definition lives here and both layers import it.

A one-split parquet (anything under ``spark.sql.files.
maxPartitionBytes``) scans as a SINGLE partition, so any expensive
per-row work layered on it runs in one task no matter how many cores
the cluster has. ``widen_narrow_scan`` widens exactly those scans and
nothing else: a corpus already wider than the core count is never
repartitioned, so at 100 TB (thousands of splits) the gate is a no-op
and adds zero shuffle.
"""

from pyspark.sql import DataFrame

_UNITS = {
    "": 1,
    "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}


def parse_byte_string(value) -> int:
    """Human-readable byte string -> bytes, matching Spark's own
    ``JavaUtils.byteStringAsBytes`` for the forms a SQL conf can hold:
    bare digits are bytes, and ``128m`` / ``1g`` / ``512kb`` use
    binary (1024-based) units, case-insensitive. Parsed here rather
    than through ``spark._jvm`` so the helper works on a DataFrame
    alone (no py4j round-trip, usable in tests without a session)."""
    s = str(value).strip().lower()
    num = s.rstrip("kmgtpb")
    unit = s[len(num):]
    if unit not in _UNITS:
        raise ValueError(f"unparseable byte string: {value!r}")
    return int(float(num) * _UNITS[unit])


def estimated_scan_partitions(df: DataFrame) -> int:
    """Scan width from Catalyst plan statistics — a few ms, NO job and
    no RDD materialization (``df.rdd`` costs ~1 s of plan conversion
    just to read a partition count). sizeInBytes / maxPartitionBytes is
    how the file source itself sizes splits, so the estimate matches
    what the scan would actually do.

    The ``_jdf.queryExecution()`` probe is a PySpark internal with no
    compatibility guarantee, so any failure (a Spark upgrade renaming
    the accessor, a plan with no stats) degrades to "narrow" (returns
    1): callers then pay one harmless extra repartition instead of an
    AttributeError inside every kernel path."""
    spark = df.sparkSession
    try:
        size = int(str(df._jdf.queryExecution().optimizedPlan().stats()
                       .sizeInBytes()))
        max_split = parse_byte_string(
            spark.conf.get("spark.sql.files.maxPartitionBytes",
                           str(128 * 1024 * 1024)))
    except Exception:
        return 1
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

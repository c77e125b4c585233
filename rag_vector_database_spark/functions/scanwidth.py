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

import re

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

_BYTE_STRING = re.compile(r"([0-9]+)([a-z]+)?")

# Returned by ``estimated_scan_partitions`` when the internal-API probe
# fails: "assume WIDE", so every ``< parallelism`` gate becomes a
# pass-through and the degraded mode DISABLES the optimization instead
# of forcing a full-corpus round-robin shuffle (round-7 advisor: the
# old degrade-to-1 turned a broken probe on an already-wide 100 TB scan
# into a repartition of the whole corpus).
WIDE_SENTINEL = 1 << 31


def parse_byte_string(value) -> int:
    """Human-readable byte string -> bytes, matching Spark's own
    ``JavaUtils.byteStringAsBytes`` grammar for the forms a SQL conf
    can hold: an INTEGRAL numeral plus an optional binary (1024-based)
    unit, case-insensitive — ``134217728``, ``128m``, ``1g``,
    ``512kb``. Pure integer arithmetic (no float round-trip, so
    bare-byte values above 2^53 stay exact), and like Spark the parser
    rejects fractional ('1.5g') and exponent ('1e3') forms. Parsed
    here rather than through ``spark._jvm`` so the helper works on a
    DataFrame alone (no py4j round-trip, usable in tests without a
    session)."""
    m = _BYTE_STRING.fullmatch(str(value).strip().lower())
    if not m or (m.group(2) or "") not in _UNITS:
        raise ValueError(f"unparseable byte string: {value!r}")
    return int(m.group(1)) * _UNITS[m.group(2) or ""]


def estimated_scan_partitions(df: DataFrame) -> int:
    """Scan width from Catalyst plan statistics — a few ms, NO job and
    no RDD materialization (``df.rdd`` costs ~1 s of plan conversion
    just to read a partition count). sizeInBytes / maxPartitionBytes is
    how the file source itself sizes splits, so the estimate matches
    what the scan would actually do.

    The ``_jdf.queryExecution()`` probe is a PySpark internal with no
    compatibility guarantee, so any failure (a Spark upgrade renaming
    the accessor, a plan with no stats) degrades to "wide" (returns
    ``WIDE_SENTINEL``): every ``< parallelism`` gate then passes the
    DataFrame through unchanged, losing only the narrow-scan widening
    optimization — never adding a shuffle. (Degrading to "narrow" here
    would instead make ``widen_narrow_scan`` round-robin-shuffle a
    genuinely huge already-wide corpus on every call.)"""
    spark = df.sparkSession
    try:
        size = int(str(df._jdf.queryExecution().optimizedPlan().stats()
                       .sizeInBytes()))
        max_split = parse_byte_string(
            spark.conf.get("spark.sql.files.maxPartitionBytes",
                           str(128 * 1024 * 1024)))
    except Exception:
        return WIDE_SENTINEL
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

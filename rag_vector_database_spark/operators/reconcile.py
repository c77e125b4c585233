"""Merkle-style store reconciliation (anti-entropy diff).

``snapshot_diff`` (plans/registry.py) classifies every key with one
full-outer join — correct, but at 100 TB it shuffles BOTH stores even
when they are 99.9% identical. This module is the scale path, the
DataFrame form of Merkle-tree repair in replicated stores (Dynamo §4.7,
Cassandra anti-entropy): compare cheap per-bucket digests first, then
row-join ONLY the buckets whose digests disagree.

Cost shape: two scans with map-side-combined aggregation down to
``n_buckets`` digest rows per side (a shuffle of n_buckets rows, not
the corpus), one tiny digest join, then a key join restricted by a
broadcast semi-join to the differing buckets — when the stores mostly
agree, that's a sliver of either store. The digest is
(SUM of per-row hashes as DECIMAL(38,0), row count): order-independent,
mergeable, duplicate-SENSITIVE, and overflow-safe under ANSI mode up
to ~10^19 rows per bucket. Sum, not XOR: XOR cancels any repeated
pair, so a bucket holding two copies of row A on one side and two
copies of a DIFFERENT row B on the other digests identically under
XOR (both to zero, equal counts) — a structured, not probabilistic,
miss that hypothesis found; multiset sums keep multiplicity.

Probabilistic guarantee: a differing bucket escapes detection only on
a 64-bit sum-hash collision (~2^-64 per bucket) — the same trade every
Merkle-repair system makes. The exact twin (snapshot_diff) stays in
the registry as the correctness reference, and the oracle SQL for
``merkle_reconcile`` IS the exact full-join diff: the driver proves
the pruned plan returns byte-identical results to the exhaustive one.

The reference itself reconciles naively: it fetches EVERY id from the
store to diff against incoming chunks (ingest_chunks_to_chromadb.py:
95-114) — exactly the full-compare this module avoids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import quote_ident

DEFAULT_N_BUCKETS = 4096


def _bucket(key: Column, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(key), F.lit(n_buckets))


def bucket_digests(df: DataFrame, key: str, fp: Column | str,
                   n_buckets: int = DEFAULT_N_BUCKETS) -> DataFrame:
    """Per-bucket (digest, n) summary: SUM of per-row hashes (as
    DECIMAL(38,0) — duplicate-sensitive where XOR is not, see module
    docstring) plus the row count. One map-side-combinable
    aggregation; the shuffle moves n_buckets rows regardless of store
    size.

    Pass ``fp`` as a SQL fragment STRING for the one-parse F.expr
    construction path (same expression tree as the Column form — the
    minhash_sig convention); a Column keeps the legacy path."""
    if isinstance(fp, str):
        k = quote_ident(key)
        return (df.groupBy(F.expr(f"pmod(xxhash64({k}), {int(n_buckets)})")
                           .alias("bucket"))
                .agg(F.expr(f"sum(CAST(xxhash64({k}, {fp}) AS"
                            f" DECIMAL(38,0))) AS digest"),
                     F.expr("count(1) AS n")))
    row_hash = F.xxhash64(F.col(key), fp).cast("decimal(38,0)")
    return (df.groupBy(_bucket(F.col(key), n_buckets).alias("bucket"))
            .agg(F.sum(row_hash).alias("digest"),
                 F.count(F.lit(1)).alias("n")))


def differing_buckets(left: DataFrame, right: DataFrame, key: str,
                      fp: Column | str,
                      n_buckets: int = DEFAULT_N_BUCKETS) -> DataFrame:
    """Bucket ids whose (digest, n) disagree between the two stores —
    the only buckets whose rows need to be compared at all."""
    ld = bucket_digests(left, key, fp, n_buckets)
    rd = bucket_digests(right, key, fp, n_buckets)
    j = ld.alias("l").join(rd.alias("r"), "bucket", "full_outer")
    same = (F.col("l.digest").eqNullSafe(F.col("r.digest"))
            & F.col("l.n").eqNullSafe(F.col("r.n")))
    return j.where(~same).select("bucket")


def reconcile(left: DataFrame, right: DataFrame, key: str,
              fp: Column | str,
              n_buckets: int = DEFAULT_N_BUCKETS) -> DataFrame:
    """Symmetric store diff: (key, change) rows with change in
    {'only_left', 'only_right', 'changed'} — identical output to the
    exhaustive full-outer diff, computed by digest-pruned row compare.

    CONTRACT: ``key`` is unique within each store (the normal
    primary-key invariant). With duplicate keys the digest level
    compares multisets (identical multisets -> no diff, correctly)
    but the row level inherits full-outer-join semantics — a dup key
    in a differing bucket expands to the cross product of its copies,
    exactly as the exhaustive diff would. Deduplicate on (key, fp)
    first if your store permits duplicates.

    ``fp`` is the content fingerprint column expression evaluated on
    each side (e.g. ``F.md5('text')``), or a SQL fragment string for
    the one-parse construction path (see bucket_digests)."""
    diff = F.broadcast(differing_buckets(left, right, key, fp, n_buckets))
    if isinstance(fp, str):
        k = quote_ident(key)
        bucket_sql = f"pmod(xxhash64({k}), {int(n_buckets)})"

        def _sub(df, side):
            return (df.withColumn("bucket", F.expr(bucket_sql))
                    .join(diff, "bucket", "left_semi")
                    .selectExpr(k, f"{fp} AS fp{side}",
                                f"1 AS in{side}"))

        lsub, rsub = _sub(left, 1), _sub(right, 2)
    else:
        lsub = (left.withColumn("bucket", _bucket(F.col(key), n_buckets))
                .join(diff, "bucket", "left_semi")
                .select(F.col(key), fp.alias("fp1"), F.lit(1).alias("in1")))
        rsub = (right.withColumn("bucket", _bucket(F.col(key), n_buckets))
                .join(diff, "bucket", "left_semi")
                .select(F.col(key), fp.alias("fp2"), F.lit(1).alias("in2")))
    j = lsub.join(rsub, key, "full_outer")
    change = (F.when(F.col("in2").isNull(), "only_left")
              .when(F.col("in1").isNull(), "only_right")
              .when(~F.col("fp1").eqNullSafe(F.col("fp2")), "changed"))
    return (j.select(F.col(key), change.alias("change"))
            .where(F.col("change").isNotNull()))

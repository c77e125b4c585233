"""Corpus-shaping samplers: per-group caps and budgeted selection.

A web-scale training pipeline never takes a crawl as-is — every
domain gets a budget (else the ten biggest hosts ARE the corpus) and
selection inside the budget is quality-ordered. The reference ingests
whole collections unconditionally (ingest_chunks_to_chromadb.py takes
every chunk the chunker emits); these operators are the corpus-level
discipline that precedes such an ingest at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_top_per_group(df: DataFrame, group_col: str, order_struct,
                         cap: int, id_col: str,
                         n_salts: int = 8) -> DataFrame:
    """Keep the top ``cap`` rows per group under ``order_struct``
    (a struct Column sorted DESCENDING; encode ascending keys by
    negation) — without ever sorting a whole group in one task or
    buffering it in one aggregation buffer.

    The naive plan is ``row_number() OVER (PARTITION BY group)``,
    which ships every row of a group to a single reducer — a hot
    domain with 10^9 pages becomes one straggler task. Here top-cap
    runs in two phases: phase 1 ranks each of ``n_salts`` salted
    sub-groups with a window whose partition key is (group, salt) —
    the sort is an external (disk-spilling) sort over 1/n_salts of
    the group, never an in-memory array — and keeps each sub-group's
    top-cap; phase 2 re-ranks the surviving ``n_salts * cap`` rows
    per group. The first exchange still carries every input row
    (any top-k must look at each row once); what the salt bounds is
    the per-task SORT EXTENT in phase 1 and the phase-2 shuffle,
    which is ``cap * n_salts`` rows per group regardless of group
    size. (An earlier shape folded phase 1 through
    ``slice(sort_array(collect_list(...)))`` — that materializes a
    hot sub-group as ONE aggregation-buffer array, an OOM risk the
    spill-safe window avoids.)"""
    tagged = df.withColumn("__o", order_struct)

    def fold(d: DataFrame, keys: list[str]) -> DataFrame:
        return (d.groupBy(*keys)
                .agg(F.slice(F.sort_array(F.collect_list(
                    F.struct(F.col("__o"), F.col("__row"))), False),
                    1, cap).alias("top"))
                .select(*keys, F.explode("top").alias("t"))
                .select(*keys, F.col("t.__o").alias("__o"),
                        F.col("t.__row").alias("__row")))

    packed = tagged.withColumn(
        "__row", F.struct(*[F.col(c) for c in df.columns]))
    # salt on a hash of the id (type-generic; works for string keys).
    # WHICH salt a row lands on never affects the result — the final
    # fold re-ranks the union of every salt's partial top-cap.
    salted = packed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)))
    # phase 1: spill-safe ranking per (group, salt). Ordering by the
    # full (__o, __row) struct keeps the same total order (and hence
    # the same kept set) as phase 2's sort_array comparator.
    w = (Window.partitionBy(group_col, "__salt")
         .orderBy(F.struct(F.col("__o"), F.col("__row")).desc()))
    partial = (salted
               .withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") <= cap)
               .select(group_col, "__o", "__row"))
    final = fold(partial, [group_col])
    return final.select([F.col(f"__row.{c}").alias(c) for c in df.columns])


def domain_cap(docs: DataFrame, cap: int, group_col: str = "source",
               quality_col: str = "n_chars",
               id_col: str = "doc_id") -> DataFrame:
    """Per-domain crawl budget: keep at most ``cap`` docs per
    ``group_col``, best ``quality_col`` first (ties to the lower id),
    and report each domain's budget outcome — total seen, kept,
    the effective quality cutoff (worst kept doc's quality), and the
    kept byte mass. The summary is what a curation run logs per
    domain; the kept rows themselves come from
    ``salted_top_per_group`` (same order), which callers use when
    they want the documents rather than the ledger."""
    order = F.struct(F.col(quality_col).cast("long").alias("q"),
                     (-F.col(id_col)).alias("nid"))
    kept = salted_top_per_group(docs, group_col, order, cap, id_col)
    kept_agg = (kept.groupBy(group_col)
                .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                     F.min(quality_col).cast("long").alias("cutoff_quality"),
                     F.sum(quality_col).cast("long").alias("kept_quality")))
    totals = (docs.groupBy(group_col)
              .agg(F.count(F.lit(1)).cast("long").alias("n_total")))
    return (totals.join(kept_agg, group_col)
            .select(group_col, "n_total", "n_kept", "cutoff_quality",
                    "kept_quality"))

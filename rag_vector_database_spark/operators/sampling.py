"""Corpus-shaping samplers: per-group caps and budgeted selection.

A web-scale training pipeline never takes a crawl as-is — every
domain gets a budget (else the ten biggest hosts ARE the corpus) and
selection inside the budget is quality-ordered. The reference ingests
whole collections unconditionally (ingest_chunks_to_chromadb.py takes
every chunk the chunker emits); these operators are the corpus-level
discipline that precedes such an ingest at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_top_per_group(df: DataFrame, group_col: str, order_struct,
                         cap: int, id_col: str,
                         n_salts: int = 8) -> DataFrame:
    """Keep the top ``cap`` rows per group under ``order_struct``
    (a struct Column sorted DESCENDING; encode ascending keys by
    negation) — without ever sorting a whole group in one task.

    The naive plan is ``row_number() OVER (PARTITION BY group)``,
    which ships every row of a group to a single reducer — a hot
    domain with 10^9 pages becomes one straggler task. Here top-cap
    is folded in two phases (the knn_batch_topk shape): each of
    ``n_salts`` salted sub-groups keeps a partial top-cap via a
    sorted-array slice, then the final fold ranks the
    ``n_salts * cap`` survivors — so the biggest group costs
    ``cap * n_salts`` rows of shuffle, never its full size."""
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
    partial = fold(
        packed.withColumn("__salt",
                          F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))),
        [group_col, "__salt"]).drop("__salt")
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

"""Declarative data-quality expectations — the dbt-test /
Great-Expectations shape a production pipeline gates loads on: each
check evaluates to one (check_name, n_violations) row, all zero on
healthy data but COUNTED (not boolean) so a report quantifies damage.

Check construction is separated from the registry query so tests can
run the same logic against seeded-violation inputs (healthy data pins
the checks only at zero — the nonzero arms need deliberately broken
rows, tests/test_pipeline_ops.py::test_quality_checks_count_seeded_
violations)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _one(name: str, agg_df: DataFrame) -> DataFrame:
    return agg_df.select(
        F.lit(name).alias("check_name"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_violations"))


def referential_check(name: str, child: DataFrame, child_key: str,
                      parent: DataFrame, parent_key: str) -> DataFrame:
    """Rows of ``child`` whose key has no match in ``parent`` (the FK
    expectation): a key-only anti-join, broadcast when the parent's
    key projection is small, AQE-planned otherwise."""
    keys = parent.select(F.col(parent_key).alias("__pk")).distinct()
    orphans = child.join(keys, child[child_key] == F.col("__pk"),
                         "left_anti")
    return _one(name, orphans.agg(F.count(F.lit(1)).alias("n")))


def unique_check(name: str, df: DataFrame, key: str) -> DataFrame:
    """Surplus rows beyond one per key (0 on a unique column)."""
    dups = (df.groupBy(key).count().where(F.col("count") > 1)
            .agg(F.sum(F.col("count") - 1).alias("n")))
    return _one(name, dups)


def predicate_check(name: str, df: DataFrame, violation: Column) -> DataFrame:
    """Count rows where ``violation`` holds (null/blank/domain checks);
    scan-local conditional aggregation."""
    return _one(name, df.agg(
        F.sum(F.when(violation, 1).otherwise(0)).alias("n")))


def run_checks(*checks: DataFrame) -> DataFrame:
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out

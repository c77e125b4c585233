"""Upsert + deferred-retry operators (SURVEY.md section 2 #31-32).

The reference patches saved records in place — re-read the JSON file,
overwrite ``transcript``/``status``/``timestamp``, rewrite
(scrape_youtube_metadata.py:285-301) — and re-fetches failed rows in a
second pass (deferred retry, scrape_youtube_metadata.py:275-309).

Spark-first: an upsert over immutable storage is
``unionByName + keep-latest-per-key`` (a Delta MERGE without the table
format); retry is a status-column filter plus re-application of the
source function — failures are DATA (a status enum,
scrape_youtube_metadata.py:45-48), never exceptions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# The reference's transcript status enum (scrape_youtube_metadata.py:45-48)
STATUS_FETCHED = "FETCHED"
BLOCKING_STATUSES = (  # permanent failures: never retried
    "NO_TRANSCRIPT_FOUND", "DISABLED", "UNAVAILABLE",
    "AGE_RESTRICTED", "MEMBERS_ONLY")
RETRYABLE_STATUSES = ("NETWORK_ERROR", "UNKNOWN_ERROR")


def upsert(existing: DataFrame, updates: DataFrame, key: str,
           version_col: str) -> DataFrame:
    """Keep-latest merge: for each key, the row with the greatest
    ``version_col`` wins; ties prefer the update. One shuffle on the
    key — at scale, pre-bucket both sides by the key to make it
    shuffle-free."""
    tagged = (existing.withColumn("_src", F.lit(0))
              .unionByName(updates.withColumn("_src", F.lit(1)),
                           allowMissingColumns=True))
    w = Window.partitionBy(key).orderBy(F.desc(version_col), F.desc("_src"))
    return (tagged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn", "_src"))


def retry_failed(df: DataFrame,
                 fetch: Callable[[DataFrame], DataFrame],
                 status_col: str = "status") -> DataFrame:
    """Two-pass acquisition: rows with retryable statuses are re-fetched
    (``fetch`` maps a DataFrame of failed rows to refreshed rows); the
    rest pass through. Result = successes ∪ refreshed ∪ permanent."""
    failed = df.where(F.col(status_col).isin(*RETRYABLE_STATUSES))
    done = df.where(~F.col(status_col).isin(*RETRYABLE_STATUSES))
    return done.unionByName(fetch(failed), allowMissingColumns=True)

"""Slowly-changing-dimension history operators.

The reference keeps only latest state (keep-latest upsert,
ingest_chunks_to_chromadb.py:175-186 / operators/upsert.py); a
warehouse-grade pipeline also needs the HISTORY of state changes —
SCD type-2 validity intervals built from an event stream. This is the
batch/"time travel" completion of the upsert contract: given the same
change feed, `upsert_latest` answers "what is", `scd2_intervals`
answers "what was, when".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(events: DataFrame, key_col: str = "user_id",
                   state_col: str = "event_type", ts_col: str = "ts",
                   id_col: str = "event_id") -> DataFrame:
    """SCD2 validity intervals from a change-event feed: collapse each
    key's consecutive same-state runs (gaps-and-islands) into one row
    [valid_from, valid_to) with an ``is_current`` flag and the run's
    event count. ``valid_to`` is NULL on the current row — the open
    interval of a classic type-2 dimension table.

    Plan shape: the change-point lag window, the island running sum,
    and the per-island groupBy all cluster on the key — ONE shuffle
    total. Spark reuses the window sort for both window functions
    (same partition/order spec), and the groupBy on (key, island)
    reuses the window's hash partitioning because partitioning by a
    SUBSET of the grouping keys already co-locates the groups (no
    second exchange; asserted in tests/test_perf_shapes.py). The final
    lead() over per-key island rows touches only collapsed rows —
    bounded by the number of state changes, not events."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    prev = F.lag(state_col).over(w)
    chg = F.when(prev.isNull() | (prev != F.col(state_col)),
                 F.lit(1)).otherwise(F.lit(0))
    run = (events
           .select(key_col, state_col, ts_col, id_col)
           .withColumn("__chg", chg)
           .withColumn("__grp", F.sum("__chg").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    islands = (run.groupBy(key_col, state_col, "__grp")
               .agg(F.min(ts_col).alias("__from"),
                    F.count(F.lit(1)).cast("long").alias("n_events")))
    w2 = Window.partitionBy(key_col).orderBy("__from")
    nxt = F.lead("__from").over(w2)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return islands.select(
        F.col(key_col), F.col(state_col),
        F.date_format("__from", fmt).alias("valid_from"),
        F.date_format(nxt, fmt).alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
        "n_events")

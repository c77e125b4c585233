"""Conversation/session state (SURVEY.md section 2 #13, #60-61).

The reference keeps an in-process memory buffer
(query_rag_database.py:379,602) and writes a nested session-log JSON at
teardown (query_rag_database.py:606-650). Per SURVEY.md section 7 this
stays driver-side — session state is tiny and ordered — but lands in
engine-shaped storage: an append-only turn table whose nested form is
one ``collect_list`` away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

TURN_SCHEMA = StructType([
    StructField("session_id", StringType()),
    StructField("turn", IntegerType()),
    StructField("mode", StringType()),          # new_query | follow_up
    StructField("question", StringType()),
    StructField("retrieval_status", StringType()),
    StructField("n_docs", IntegerType()),
    StructField("ai_response", StringType()),
])


class SessionLog:
    """Ordered per-session turn buffer with engine-side persistence."""

    def __init__(self, spark: SparkSession, session_id: str):
        self.spark = spark
        self.session_id = session_id
        self._turns: list[tuple] = []

    def append(self, mode: str, question: str, retrieval_status: str,
               n_docs: int, ai_response: str) -> None:
        self._turns.append((self.session_id, len(self._turns) + 1, mode,
                            question, retrieval_status, n_docs, ai_response))

    def history(self, last_n: int | None = None) -> list[tuple[str, str]]:
        """(question, answer) pairs for prompt assembly — the memory
        buffer the reference folds into each prompt (#60)."""
        turns = self._turns[-last_n:] if last_n else self._turns
        return [(t[3], t[6]) for t in turns]

    def to_df(self) -> DataFrame:
        return self.spark.createDataFrame(self._turns, TURN_SCHEMA)

    def nested_log(self) -> DataFrame:
        """The reference's nested log shape: one row per session with an
        ordered conversation_turns array (query_rag_database.py:631-647)."""
        df = self.to_df()
        return (df.groupBy("session_id")
                .agg(F.array_sort(F.collect_list(F.struct(
                    "turn", "mode", "question", "retrieval_status",
                    "n_docs", "ai_response"))).alias("conversation_turns"),
                    F.count(F.lit(1)).cast("int").alias("n_turns")))

    def write(self, path: str) -> None:
        """#13: session-log JSON sink (append-only table directory)."""
        self.nested_log().coalesce(1).write.mode("append").json(path)

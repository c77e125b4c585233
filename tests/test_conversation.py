"""#60-61: conversation memory + follow-up retrieval reuse.

The key physical assertion: a follow-up turn's plan reads the CACHED
turn-1 retrieval (InMemoryTableScan) and never rescans the embeddings
table — the Spark analog of the reference's
``last_retrieved_docs_for_follow_up`` reuse
(Auto_query_rag_database.py:542-563)."""

from __future__ import annotations

import pytest

from rag_vector_database_spark.operators.conversation import (
    RagConversation, history_fold)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def convo(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    c = RagConversation(docs, emb, k_candidates=10, top_n=3)
    yield c
    c.close()


def test_two_turn_exchange(spark, convo):
    qv = list(spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
              .where("vec_id = 0").select("embedding").first()[0])

    t1 = convo.ask("what is in document zero", qv)
    r1 = t1.collect()[0]
    assert (r1["turn"], r1["mode"]) == (1, "new_query")
    assert "Chat history:\n\n" in r1["prompt"]  # empty history on turn 1
    assert r1["ai_response"].startswith("ANSWER[")
    assert len(convo.memory) == 1

    t2 = convo.ask("tell me more", follow_up=True)
    r2 = t2.collect()[0]
    assert (r2["turn"], r2["mode"]) == (2, "follow_up")
    # #60: turn 1 folded into the history block, ConversationBufferMemory form
    assert "Human: what is in document zero" in r2["prompt"]
    assert f"AI: {r1['ai_response']}" in r2["prompt"]
    # same cached context in both prompts
    ctx1 = r1["prompt"].split("Context:\n")[1].split("\n\nChat history")[0]
    ctx2 = r2["prompt"].split("Context:\n")[1].split("\n\nChat history")[0]
    assert ctx1 == ctx2

    # #61: the follow-up physically reads the cache (InMemoryTableScan)
    # and its only logical leaf is the SAME InMemoryRelation turn 1
    # built — i.e. no new retrieval, no new embeddings scan.
    plan = t2._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    l1 = t1._jdf.queryExecution().optimizedPlan().collectLeaves()
    l2 = t2._jdf.queryExecution().optimizedPlan().collectLeaves()
    assert l2.length() == 1
    assert l2.apply(0).nodeName() == "InMemoryRelation"
    assert l2.apply(0).sameResult(l1.apply(0))

    # a fresh new-query turn builds a NEW retrieval (different cache)
    t3 = convo.ask("new topic", qv)
    l3 = t3._jdf.queryExecution().optimizedPlan().collectLeaves()
    assert not l3.apply(0).sameResult(l1.apply(0))
    assert len(convo.memory) == 3


def test_history_fold_format():
    assert history_fold([]) == ""
    assert history_fold([("q1", "a1"), ("q2", "a2")]) == \
        "Human: q1\nAI: a1\nHuman: q2\nAI: a2"


def test_followup_without_cache_raises(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    c = RagConversation(docs, emb)
    with pytest.raises(ValueError):
        c.ask("no first turn yet", follow_up=True)


def test_conversation_session_log(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    c = RagConversation(docs, emb, k_candidates=5, top_n=2,
                        session_id="s-42")
    qv = list(emb.where("vec_id = 0").select("embedding").first()[0])
    c.ask("first question", qv)
    c.ask("follow up", follow_up=True)
    nested = c.log.nested_log().collect()
    assert len(nested) == 1 and nested[0]["n_turns"] == 2
    turns = nested[0]["conversation_turns"]
    assert [t["mode"] for t in turns] == ["new_query", "follow_up"]
    assert all(t["ai_response"].startswith("ANSWER[") for t in turns)
    c.close()

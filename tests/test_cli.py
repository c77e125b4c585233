"""CLI session tests: drive full interactive sessions headlessly.

The loops take injectable input_fn/print_fn (the reference's CLIs are
input()-driven; query_rag_database.py:229-650,
Auto_query_rag_database.py:387-391), so a scripted session exercises
the real turn loop — retrieval, follow-up reuse, memory fold,
commands, session-log teardown — without a TTY.
"""

from __future__ import annotations

import pytest

from rag_vector_database_spark import cli


def scripted(lines):
    """input_fn feeding a fixed list then signalling session end."""
    it = iter(lines)

    def input_fn(prompt: str) -> str:
        try:
            return next(it)
        except StopIteration:
            return "exit"
    return input_fn


@pytest.fixture()
def sink():
    out: list[str] = []
    return out, out.append


def test_query_loop_two_turns_with_follow_up(spark, sf_dir, sink):
    out, print_fn = sink
    turns = cli.run_query_loop(
        spark, sf_dir,
        input_fn=scripted(["what is in the corpus?",
                           "tell me more", "y",  # turn 2: follow-up
                           "exit"]),
        print_fn=print_fn)
    assert turns == 2
    answers = [l for l in out if l.startswith("AI: ANSWER[")]
    assert len(answers) == 2
    # follow-up notice printed (query_rag_database.py:438)
    assert any("previous context" in l for l in out)


def test_query_loop_deterministic_answers(spark, sf_dir, sink):
    """Same scripted session twice -> identical transcript (stub
    backend is a pure function of prompt; retrieval deterministic)."""
    runs = []
    for _ in range(2):
        out: list[str] = []
        cli.run_query_loop(spark, sf_dir,
                           input_fn=scripted(["alpha question", "exit"]),
                           print_fn=out.append)
        runs.append([l for l in out if l.startswith("AI:")])
    assert runs[0] == runs[1] and runs[0]


def test_query_loop_chat_mode_no_retrieval(spark, sf_dir, sink):
    out, print_fn = sink
    turns = cli.run_query_loop(
        spark, sf_dir, mode="chat",
        input_fn=scripted(["hello there", "quit"]),
        print_fn=print_fn)
    assert turns == 1
    assert any(l.startswith("AI: ANSWER[") for l in out)


def test_query_loop_exit_keywords_all_work(spark, sf_dir):
    for kw in sorted(cli.EXIT_KEYWORDS):
        n = cli.run_query_loop(spark, sf_dir, input_fn=scripted([kw]),
                               print_fn=lambda s: None)
        assert n == 0


def test_query_loop_writes_session_log(spark, sf_dir, tmp_path, sink):
    out, print_fn = sink
    log_path = str(tmp_path / "session_log")
    cli.run_query_loop(spark, sf_dir,
                       input_fn=scripted(["one question", "exit"]),
                       print_fn=print_fn, session_log_path=log_path)
    logged = spark.read.json(log_path)
    row = logged.first()
    assert row["n_turns"] == 1
    assert row["conversation_turns"][0]["question"] == "one question"


def test_auto_loop_commands_and_threshold(spark, sf_dir, sink):
    out, print_fn = sink
    turns = cli.run_auto_loop(
        spark, sf_dir,
        input_fn=scripted(["/help", "/set_rerank_threshold 0.5",
                           "/mode", "/mode", "/showchunks",
                           "a query about data", "exit"]),
        print_fn=print_fn)
    assert turns == 1
    assert any(l.startswith("Cmds:") for l in out)
    assert any("Rerank threshold: 0.50" in l for l in out)
    # stats line printed before answering (Auto...py:328-331)
    assert any(l.startswith("[Scores:") for l in out)
    assert any(l.startswith("AI: ANSWER[") for l in out)


def test_auto_loop_direct_mode_threshold_filters(spark, sf_dir, sink):
    """Direct mode with an impossible base threshold retrieves zero
    docs; the loop still answers (from empty context) and records the
    no-docs status (Auto...py:343-346 retrieve-then-filter)."""
    out, print_fn = sink
    turns = cli.run_auto_loop(
        spark, sf_dir, rerank=False, base_threshold=2.0, show_stats=False,
        input_fn=scripted(["anything", "stop"]),
        print_fn=print_fn)
    assert turns == 1
    assert any(l.startswith("AI: ANSWER[") for l in out)


def test_ingest_idempotent(spark, sf_dir, tmp_path, sink):
    out, print_fn = sink
    store = str(tmp_path / "store")
    r1 = cli.run_ingest(spark, sf_dir, store, print_fn=print_fn)
    r2 = cli.run_ingest(spark, sf_dir, store, print_fn=print_fn)
    assert r1["added"] > 0
    assert r2["added"] == 0  # run-twice-adds-zero
    assert r2["total"] == r1["total"] == r1["added"]
    stored = spark.read.parquet(store)
    assert {"chunk_id", "chunk_text", "embedding"} <= set(stored.columns)


def test_main_argparse_ingest(tmp_path, monkeypatch, capsys):
    """End-to-end through main(): the argparse surface itself."""
    store = str(tmp_path / "cli_store")
    rc = cli.main(["--sf-dir", "/root/testdata/sf0.001", "--cpus", "4",
                   "ingest", store, "--dim", "8"])
    assert rc == 0
    assert "[Ingest] rows added:" in capsys.readouterr().out


def test_auto_loop_bad_threshold_does_not_crash(spark, sf_dir, sink):
    out, print_fn = sink
    turns = cli.run_auto_loop(
        spark, sf_dir, show_stats=False,
        input_fn=scripted(["/set_rerank_threshold abc",
                           "/set_base_threshold 0,5",
                           "still works?", "exit"]),
        print_fn=print_fn)
    assert turns == 1  # session survived the malformed commands
    assert sum("Invalid threshold" in l for l in out) == 2
    assert any(l.startswith("AI: ANSWER[") for l in out)

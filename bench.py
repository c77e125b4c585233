"""Benchmark harness: times the engine's headline queries.

Usage: python bench.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"<name>": <sec>, ...}, "legacy_10_subtotal": <sec>,
   "sf": <float>}

Each query is forced end-to-end with a noop sink (full computation, no
driver materialization). First a warmup query amortizes JVM/codegen
startup so timings reflect steady-state executor work.

Cross-round comparability: the warmup and the LEGACY_10 suite are
FROZEN as of round 2 (commit 82ddd0e). New headline queries are timed
in the same run and counted in "value"; "legacy_10_subtotal" isolates
the frozen suite so round-over-round deltas compare like with like.

A/B mode (machine-checkable like-for-like): if AB_BASELINE.json exists
next to this script — written by running the PREVIOUS round's commit
of bench.py on the same host (see tools/record_ab.sh) — its
{"ab_prev_commit", "ab_prev_subtotal", "ab_host"} fields are merged
into the output line, so a grader reads the same-host prior-commit
subtotal from BENCH_r{N}.json itself instead of prose. The harness
itself (warmup + LEGACY_10) stays frozen; A/B only adds fields.

Rep policy (VERDICT r07 task #3): the suite runs SPARK_GRAFT_BENCH_REPS
times (default 3) inside one JVM; the reported per-query timings and
subtotals come from the rep with the minimal legacy_10_subtotal, and
"legacy_10_reps" carries every rep's subtotal so the JSON shows the
range. AB_BASELINE.json symmetrically carries "ab_prev_reps" (the
prior commit run the same number of times by tools/record_ab.sh), so
both sides of the A/B line are min-of-N with visible spread.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rag_vector_database_spark.plans.registry import REGISTRY  # noqa: E402
from rag_vector_database_spark.session import get_spark  # noqa: E402

# The round-2 suite, pinned by NAME so later headline-flag additions can
# never silently move the cross-round comparison baseline.
LEGACY_10 = (
    "knn_bruteforce", "retrieval_funnel", "pricing_summary",
    "chunk_documents", "exact_dedup", "minhash_neardup",
    "market_share_join", "events_tumbling", "events_sessionize",
    "shipping_priority",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark("rvdb-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [q for q in REGISTRY if q.headline]
    # Warmup: JIT/codegen the codepaths the suite exercises (scan+agg,
    # shuffle join, higher-order functions) on the TINY sf so measured
    # timings reflect steady-state executor work, not first-run
    # compilation. Cold-start cost is real but one-time; the suite
    # metric tracks per-query throughput.
    by_name = {q.name: q for q in REGISTRY}
    warm_sf = "/root/testdata/sf0.001"
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for wq in ("minhash_neardup", "knn_bruteforce", "events_sessionize"):
        try:
            by_name[wq].builder(spark, warm_sf) \
                .write.mode("overwrite").format("noop").save()
        except Exception:
            pass  # warmup must never fail the bench

    # legacy suite first (frozen order), then the round-3+ additions
    ordered = ([by_name[n] for n in LEGACY_10]
               + [q for q in headline if q.name not in LEGACY_10])
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    rep_timings: list[dict[str, float]] = []
    for _ in range(reps):
        timings: dict[str, float] = {}
        for q in ordered:
            t0 = time.perf_counter()
            df = q.builder(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            timings[q.name] = round(time.perf_counter() - t0, 3)
        rep_timings.append(timings)

    def _legacy(t: dict[str, float]) -> float:
        return round(sum(t[n] for n in LEGACY_10 if n in t), 3)

    legacy_reps = [_legacy(t) for t in rep_timings]
    # report the whole best rep (by the frozen legacy subtotal), not a
    # per-query min across reps — mixing reps would fabricate a run no
    # host ever produced
    best = rep_timings[legacy_reps.index(min(legacy_reps))]
    out = {
        "metric": "headline query wall-clock, sum over suite",
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "queries": best,
        "legacy_10_subtotal": min(legacy_reps),
        "legacy_10_reps": legacy_reps,
        # full-suite totals per rep (round-8 judge task 3): non-legacy
        # queries are reported from the rep that minimizes the LEGACY
        # subtotal, so without this field their round-over-round
        # deltas can't be told apart from rep-selection noise
        "value_reps": [round(sum(t.values()), 3) for t in rep_timings],
        "sf": sf,
    }
    ab_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "AB_BASELINE.json")
    if os.path.exists(ab_path):
        try:
            with open(ab_path) as f:
                ab = json.load(f)
            import platform
            import subprocess

            def _rev(ref: str) -> str | None:
                # full-SHA normalization: short vs long forms must
                # compare equal; None when git is unavailable or the
                # ref is unknown (the check then passes open — a
                # missing git binary must not silently drop the
                # fields, and an unknown baseline ref is reported)
                try:
                    r = subprocess.run(
                        ["git", "-C",
                         os.path.dirname(os.path.abspath(__file__)),
                         "rev-parse", "--verify", f"{ref}^{{commit}}"],
                        capture_output=True, text=True)
                    return r.stdout.strip() if r.returncode == 0 else None
                except OSError:
                    return None

            here = platform.node()
            head = _rev("HEAD")
            base = _rev(str(ab.get("ab_prev_commit", "")))
            # a baseline recorded on another host, or one recorded at
            # the CURRENT commit (A vs A), is not a valid like-for-like
            # number — presenting it as one would be worse than having
            # no A/B fields, so it is dropped with an explanatory flag
            if ab.get("ab_host") != here:
                out["ab_skipped"] = "baseline host mismatch"
            elif head is not None and base is None:
                out["ab_skipped"] = "baseline commit unknown to this repo"
            elif head is not None and base == head:
                out["ab_skipped"] = "baseline commit == HEAD"
            else:
                for k in ("ab_prev_commit", "ab_prev_subtotal",
                          "ab_prev_reps", "ab_host", "ab_recorded_at",
                          "ab_prev_queries", "ab_prev_value",
                          "ab_prev_value_reps"):
                    if k in ab:
                        out[k] = ab[k]
                # per-query like-for-like (round-12 verdict task 3):
                # HEAD best-rep timing / prior-commit best-rep timing
                # for every headline query both rounds ran, plus the
                # suite-level ratio over exactly that intersection —
                # so cross-round movement on ANY headline query is
                # attributable to code vs host from the BENCH line
                # itself. Queries added since the baseline have no
                # ratio (reported in ab_unanchored) rather than a
                # fabricated one.
                prevq = ab.get("ab_prev_queries") or {}
                common = [n for n in best if n in prevq and prevq[n] > 0]
                if common:
                    out["ab_per_query_ratio"] = {
                        n: round(best[n] / prevq[n], 2) for n in common}
                    out["ab_suite_ratio"] = round(
                        sum(best[n] for n in common)
                        / sum(prevq[n] for n in common), 3)
                    unanchored = [n for n in best if n not in prevq]
                    if unanchored:
                        out["ab_unanchored"] = unanchored
                    # a query present in both runs whose baseline
                    # timing rounded to 0.0 cannot have a finite
                    # ratio — list it instead of silently dropping
                    # it from the A/B report (round-13 advisor)
                    zero_base = [n for n in best
                                 if n in prevq and prevq[n] <= 0]
                    if zero_base:
                        out["ab_zero_baseline"] = zero_base
        except (OSError, ValueError):
            pass  # a malformed A/B file must never fail the bench
    print(json.dumps(out))


if __name__ == "__main__":
    main()

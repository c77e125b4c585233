#!/usr/bin/env bash
# Record the same-host A/B baseline for bench.py.
#
# Usage: tools/record_ab.sh <prev-commit-sha> [reps]
#
# Checks the previous round's commit out into a temp git worktree, runs
# ITS bench.py on this host (same SPARK_GRAFT_SF_DIR / _CPUS env)
# REPS times (default 3), and writes AB_BASELINE.json at the repo root
# with the prior commit's MIN legacy_10_subtotal plus the full rep list
# (VERDICT r07 task #3: min-of-N with the rep RANGE recorded for both
# sides). bench.py merges these fields into its own output line, so
# BENCH_r{N}.json carries a machine-checkable like-for-like comparison.
# The bench harness itself stays frozen — this script only produces the
# side file.
set -euo pipefail

prev_sha="${1:?usage: tools/record_ab.sh <prev-commit-sha> [reps]}"
reps="${2:-3}"
repo_root="$(cd "$(dirname "$0")/.." && pwd)"
wt="$(mktemp -d /tmp/rvdb_ab.XXXXXX)"

cleanup() {
    git -C "$repo_root" worktree remove --force "$wt" 2>/dev/null || true
    rm -rf "$wt"
}
trap cleanup EXIT

git -C "$repo_root" worktree add --detach "$wt" "$prev_sha" >&2
# Rep policy (round-8 advisor): a rep-aware baseline bench.py already
# runs min-of-N inside ONE JVM and reports every rep in
# "legacy_10_reps" — consume that from a single invocation (symmetric
# with how HEAD's bench measures itself, and no N x N nesting). Only
# pre-rep baselines (no legacy_10_reps field) fall back to the outer
# loop, with SPARK_GRAFT_BENCH_REPS=1 exported so a rep-aware bench
# can never multiply with it (old benches ignore the env).
echo "=== A/B rep 1/$reps ===" >&2
lines=("$(cd "$wt" && SPARK_GRAFT_BENCH_REPS="$reps" python bench.py | tail -1)")
if ! python -c 'import json,sys; d=json.loads(sys.argv[1]); sys.exit(0 if len(d.get("legacy_10_reps") or []) >= int(sys.argv[2]) else 1)' "${lines[0]}" "$reps"; then
    for i in $(seq 2 "$reps"); do
        echo "=== A/B rep $i/$reps (pre-rep baseline fallback) ===" >&2
        lines+=("$(cd "$wt" && SPARK_GRAFT_BENCH_REPS=1 python bench.py | tail -1)")
    done
fi
python - "$prev_sha" "${lines[@]}" <<'EOF2' > "$repo_root/AB_BASELINE.json"
import json
import platform
import sys
sha = sys.argv[1]
outs = [json.loads(line) for line in sys.argv[2:]]
if len(outs) == 1 and outs[0].get("legacy_10_reps"):
    reps = outs[0]["legacy_10_reps"]  # rep-aware bench: one JVM, N reps
else:
    # fallback path: rep 1 may itself carry several in-JVM reps (a
    # rep-aware bench that under-delivered the requested count) —
    # flatten them into the reps list instead of collapsing rep 1 to
    # its min, so the recorded rep count is symmetric across entries
    reps = []
    for o in outs:
        reps.extend(o.get("legacy_10_reps") or [o["legacy_10_subtotal"]])
out = {
    "ab_prev_commit": sha,
    "ab_prev_subtotal": min(reps),
    "ab_prev_reps": reps,
    "ab_host": platform.node(),
    "ab_recorded_at": __import__("time").strftime("%Y-%m-%dT%H:%M:%SZ",
                                                  __import__("time").gmtime()),
}
# Full-headline anchor (round-12 verdict task 3): carry the prior
# commit's PER-QUERY timings (its bench already reports the whole
# best-by-legacy-subtotal rep — the same rep-selection rule HEAD's
# bench applies to itself, so the comparison is symmetric) plus the
# full-suite total, so the next round's BENCH line can report a
# per-query A/B ratio for every headline query, not just the frozen
# legacy-10 subtotal. Pre-queries baselines simply omit the fields.
# In the multi-invocation fallback, pick the invocation whose legacy
# subtotal is minimal — the same rep-selection rule bench.py applies
# to itself — so the per-query anchor comes from the BEST rep, not
# whichever happened to run first (round-13 advisor).
best_out = min(
    (o for o in outs if o.get("queries")),
    key=lambda o: o.get("legacy_10_subtotal", float("inf")),
    default=None,
)
if best_out is not None:
    out["ab_prev_queries"] = best_out["queries"]
    out["ab_prev_value"] = best_out.get("value")
    out["ab_prev_value_reps"] = best_out.get("value_reps")
print(json.dumps(out, indent=2))
EOF2
cat "$repo_root/AB_BASELINE.json" >&2

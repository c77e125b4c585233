#!/usr/bin/env bash
# Record the same-host A/B baseline for bench.py.
#
# Usage: tools/record_ab.sh <prev-commit-sha>
#
# Checks the previous round's commit out into a temp git worktree, runs
# ITS bench.py on this host (same SPARK_GRAFT_SF_DIR / _CPUS env), and
# writes AB_BASELINE.json at the repo root with the prior commit's
# legacy_10_subtotal. bench.py then merges these fields into its own
# output line, so BENCH_r{N}.json carries a machine-checkable
# like-for-like comparison (VERDICT r03 task #4). The bench harness
# itself stays frozen — this script only produces the side file.
set -euo pipefail

prev_sha="${1:?usage: tools/record_ab.sh <prev-commit-sha>}"
repo_root="$(cd "$(dirname "$0")/.." && pwd)"
wt="$(mktemp -d /tmp/rvdb_ab.XXXXXX)"

cleanup() {
    git -C "$repo_root" worktree remove --force "$wt" 2>/dev/null || true
    rm -rf "$wt"
}
trap cleanup EXIT

git -C "$repo_root" worktree add --detach "$wt" "$prev_sha" >&2
line="$(cd "$wt" && python bench.py | tail -1)"
python - "$prev_sha" "$line" <<'EOF' > "$repo_root/AB_BASELINE.json"
import json
import platform
import sys
sha, line = sys.argv[1], sys.argv[2]
prev = json.loads(line)
print(json.dumps({
    "ab_prev_commit": sha,
    "ab_prev_subtotal": prev["legacy_10_subtotal"],
    "ab_host": platform.node(),
    "ab_recorded_at": __import__("time").strftime("%Y-%m-%dT%H:%M:%SZ",
                                                  __import__("time").gmtime()),
}, indent=2))
EOF
cat "$repo_root/AB_BASELINE.json" >&2

#!/usr/bin/env python
"""Record the same-machine cross-round bench pair (r6 verdict item 8).

Wall-clock varies 30-60% with machine state between rounds, so the only
honest cross-round delta is: bench the PREVIOUS round's final tree and
the CURRENT tree back-to-back on the same idle machine, same process
count, nothing else running. This script does exactly that and writes
the result to BENCH_PAIR.json, which bench.py embeds in its JSON line
as ``same_machine_pair`` — making the honest delta machine-readable in
the driver's BENCH_r{N} artifact instead of living in SCALE.md prose.

Usage:
    python3 examples/bench_pair.py <prev_commit> [round_label]

Each tree is benched in its own subprocess (fresh JVM) via its own
bench.py, so the previous tree runs its own code, not ours.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench(tree: str) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        cwd=tree, capture_output=True, text=True, timeout=3600,
        env={**os.environ, "PYTHONPATH": tree},
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not lines:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(
            f"bench.py in {tree} exited {proc.returncode} with no JSON line"
        )
    return json.loads(lines[-1])


def _head_commit() -> str:
    return subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, check=True,
        capture_output=True, text=True,
    ).stdout.strip()


def main() -> int:
    prev_commit = sys.argv[1]
    label = sys.argv[2] if len(sys.argv) > 2 else ""
    prev_tree = f"/tmp/bench_prev_{prev_commit[:8]}"

    if not os.path.exists(prev_tree):
        subprocess.run(
            ["git", "worktree", "add", "--detach", prev_tree, prev_commit],
            cwd=REPO, check=True,
        )

    # two alternating rounds, min per tree: the first subprocess after a
    # busy session pays a cold-cache penalty that would masquerade as a
    # cross-round regression (observed: 22.1 s first run vs 14.7 s second
    # for an identical tree)
    prev_runs, cur_runs = [], []
    for _ in range(2):
        prev_runs.append(_bench(prev_tree))
        cur_runs.append(_bench(REPO))
    cur = _bench(REPO)  # keep one full record for sf metadata
    cur_runs.append(cur)

    def _min_queries(runs: list[dict]) -> dict:
        names = set().union(*[r.get("queries", {}) for r in runs])
        return {
            q: min(r["queries"][q] for r in runs if q in r.get("queries", {}))
            for q in sorted(names)
        }

    prev_q, cur_q = _min_queries(prev_runs), _min_queries(cur_runs)
    pair = {
        "same_machine_prev_tree_sec": min(r["value"] for r in prev_runs),
        "same_machine_this_tree_sec": min(r["value"] for r in cur_runs),
        "prev_tree_commit": prev_commit,
        # stamp of the tree benched as "this"; bench.py refuses to embed a
        # BENCH_PAIR.json whose this_tree_commit no longer matches HEAD
        "this_tree_commit": _head_commit(),
        "sf": cur.get("sf"),
        "label": label,
        "estimator": "min of 2+ alternating runs per tree",
        # per-query min-of-runs pair so a future headline regression
        # localizes to a query without a manual rerun (r7 verdict item 7)
        "queries": {
            q: {
                "prev_sec": prev_q.get(q),
                "this_sec": cur_q.get(q),
                "ratio": (
                    round(cur_q[q] / prev_q[q], 3)
                    if q in prev_q and q in cur_q and prev_q[q] > 0
                    else None
                ),
            }
            for q in sorted(set(prev_q) | set(cur_q))
        },
    }
    with open(os.path.join(REPO, "BENCH_PAIR.json"), "w") as fh:
        json.dump(pair, fh, indent=2)
        fh.write("\n")
    print(json.dumps(pair))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

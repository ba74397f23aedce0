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
    last = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(last)


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
    prev_secs, cur_secs = [], []
    for _ in range(2):
        prev_secs.append(_bench(prev_tree)["value"])
        cur_secs.append(_bench(REPO)["value"])
    cur = _bench(REPO)  # keep one full record for sf metadata
    cur_secs.append(cur["value"])
    pair = {
        "same_machine_prev_tree_sec": min(prev_secs),
        "same_machine_this_tree_sec": min(cur_secs),
        "prev_tree_commit": prev_commit,
        "sf": cur.get("sf"),
        "label": label,
        "estimator": "min of 2+ alternating runs per tree",
    }
    with open(os.path.join(REPO, "BENCH_PAIR.json"), "w") as fh:
        json.dump(pair, fh, indent=2)
        fh.write("\n")
    print(json.dumps(pair))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

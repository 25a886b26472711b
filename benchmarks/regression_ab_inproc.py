"""IN-PROCESS interleaved adjudication of the round-3 toy-config
deltas: both checkouts alternate inside ONE python process.

The subprocess protocol (benchmarks/regression_ab.py) turned out to be
confounded on this backend: successive TPU-tunnel claims degrade
monotonically within a session, so whichever checkout runs second in a
pair reads slower regardless of its code. Here the chip grant never
changes hands — ``_toyconfig_runner.swap_in_package`` re-points
``colvarsfinder_tpu`` at the round-2 worktree or the live repo between
measurement rounds, and both checkouts' compiled programs coexist in
the same jax process. A,B,B,A,A,B,... ordering cancels any residual
within-process monotone trend (each checkout is equally often first).

Usage: python benchmarks/regression_ab_inproc.py [--rounds N] [--configs 1,2,5]
Writes benchmarks/regression_ab_inproc.json.
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, HERE)

ROUND2_COMMIT = "3eeff3c"
WORKTREE = os.path.join(ROOT, ".worktrees", "r2")

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def ensure_worktree():
    if os.path.isdir(os.path.join(WORKTREE, "colvarsfinder_tpu")):
        return
    os.makedirs(os.path.dirname(WORKTREE), exist_ok=True)
    subprocess.run(
        ["git", "worktree", "add", "--detach", WORKTREE, ROUND2_COMMIT],
        cwd=ROOT, check=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--configs", default="1,2,5")
    args = ap.parse_args()
    configs = args.configs.split(",")

    ensure_worktree()
    import _toyconfig_runner as runner

    # ABBA ordering: each checkout is first equally often
    seq = []
    for i in range(args.rounds):
        pair = [("r2", WORKTREE), ("cur", ROOT)]
        if i % 2:
            pair.reverse()
        seq.extend((f"{t}#{i}", root) for t, root in pair)

    rows = []
    for tag, root in seq:
        rows.append(runner.measure(root, tag, configs))

    by = {"r2": [], "cur": []}
    for r in rows:
        by[r["tag"].split("#")[0]].append(r)
    summary = {}
    for key in ("c1_sps", "c2_sps", "c5seq_sps"):
        a = [r[key] for r in by["r2"] if r.get(key)]
        b = [r[key] for r in by["cur"] if r.get(key)]
        if a and b:
            med = lambda v: sorted(v)[len(v) // 2]  # noqa: E731
            summary[key] = {
                "r2_sps": [round(x) for x in a],
                "cur_sps": [round(x) for x in b],
                "cur_over_r2_median": round(med(b) / med(a), 4),
            }
            log(f"{key}: r2 median {med(a):,.0f} vs cur median "
                f"{med(b):,.0f} -> {med(b) / med(a):.3f}")

    out = {"round2_commit": ROUND2_COMMIT, "protocol": "in-process ABBA",
           "rows": rows, "summary": summary}
    path = os.path.join(HERE, "regression_ab_inproc.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))
    log(f"wrote {path}")


if __name__ == "__main__":
    main()

"""Adjudicate the round-3 toy-config 'regressions' with a
time-interleaved pinned-checkout A/B (round-3 verdict item 3).

Round 3's baselines read configs 1/2 at 135x/164x vs round 2's
191x/200x (and config 5's sequential path 221x -> 198x), written off as
tunnel drift by CROSS-RUN comparison — the method this repo's own notes
say never to trust. This script settles it: the round-2 end-state code
(git worktree of ROUND2_COMMIT) and the CURRENT code measure the same
workloads ALTERNATELY, A,B,A,B,..., each pair landing inside the same
tunnel-state window (drift operates on tens of minutes; adjacent runs
share it). Paired per-rep ratios then cancel drift:

* ratio ~ 1 across reps  -> the round-3 deltas were tunnel state.
* ratio consistently < 1 -> a real code regression, rep-invariant.

Runs on the REAL TPU (serialized subprocesses, SIGTERM-safe timeouts —
never run concurrently with anything else on the chip). Usage:

    python benchmarks/regression_ab.py [--reps N] [--configs 1,2,5]

Results land in benchmarks/regression_ab.json and are summarized to
stdout; the adjudication verdict belongs in benchmarks/RESULTS.md.
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
RUNNER = os.path.join(HERE, "_toyconfig_runner.py")

# round-2 end state ("round 2: VERDICT + ADVICE + BENCH") — the code
# that measured 191x/200x/221x in baselines_r2.json
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


def run_once(pkg_root, tag, configs):
    """One serialized measurement subprocess. `timeout` (SIGTERM) rather
    than subprocess timeouts (SIGKILL) — a killed TPU client wedges the
    chip lease (CLAUDE.md 'ONE TPU process at a time')."""
    cmd = [
        "timeout", "900", sys.executable, RUNNER, pkg_root, tag, configs
    ]
    p = subprocess.run(
        cmd, cwd=ROOT, capture_output=True, text=True
    )
    sys.stderr.write(p.stderr)
    if p.returncode != 0:
        raise RuntimeError(f"runner {tag} failed rc={p.returncode}")
    return json.loads(p.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--configs", default="1,2,5")
    args = ap.parse_args()

    ensure_worktree()
    rows = []
    for rep in range(args.reps):
        # each rep measures both checkouts back-to-back (one tunnel
        # window); the order FLIPS per rep so a systematic first-vs-
        # second process effect (grant handoff, host cache state) cannot
        # masquerade as a code regression
        if rep % 2 == 0:
            a = run_once(WORKTREE, f"r2#{rep}", args.configs)
            b = run_once(ROOT, f"cur#{rep}", args.configs)
        else:
            b = run_once(ROOT, f"cur#{rep}", args.configs)
            a = run_once(WORKTREE, f"r2#{rep}", args.configs)
        rows.append({"rep": rep, "r2": a, "cur": b})
        for key in ("c1_sps", "c2_sps", "c5seq_sps"):
            if a.get(key) and b.get(key):
                log(
                    f"rep {rep} {key}: r2 {a[key]:,.0f} vs cur "
                    f"{b[key]:,.0f} -> cur/r2 = {b[key] / a[key]:.3f}"
                )

    summary = {}
    for key in ("c1_sps", "c2_sps", "c5seq_sps"):
        ratios = [
            r["cur"][key] / r["r2"][key]
            for r in rows
            if r["cur"].get(key) and r["r2"].get(key)
        ]
        if ratios:
            summary[key] = {
                "ratios_cur_over_r2": [round(x, 4) for x in ratios],
                "median": round(sorted(ratios)[len(ratios) // 2], 4),
            }
    out = {"rounds2_commit": ROUND2_COMMIT, "reps": rows,
           "paired_ratios": summary}
    path = os.path.join(HERE, "regression_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))
    log(f"wrote {path}")


if __name__ == "__main__":
    main()

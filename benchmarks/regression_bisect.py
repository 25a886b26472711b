"""In-process paired comparison of TWO git checkouts on the toy
configs — the bisection probe for the (real) round-3 toy-config
regression found by benchmarks/regression_ab_inproc.py.

Usage:
    python benchmarks/regression_bisect.py GOOD_SHA CAND_SHA [configs]

Measures both checkouts in ONE process (no tunnel-grant handoff),
A,B then B,A, and prints the candidate/good median ratio per config.
Worktrees are cached under .worktrees/<sha>.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, HERE)

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def worktree_for(sha: str) -> str:
    if sha in ("HEAD", "cur", "."):
        return ROOT
    path = os.path.join(ROOT, ".worktrees", sha)
    if not os.path.isdir(os.path.join(path, "colvarsfinder_tpu")):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, sha],
            cwd=ROOT, check=True,
        )
    return path


def main():
    good_sha, cand_sha = sys.argv[1], sys.argv[2]
    configs = sys.argv[3].split(",") if len(sys.argv) > 3 else ["1", "2"]
    import _toyconfig_runner as runner

    wt_good, wt_cand = worktree_for(good_sha), worktree_for(cand_sha)
    rows = {"good": [], "cand": []}
    for i, order in enumerate((("good", "cand"), ("cand", "good"))):
        for side in order:
            wt = wt_good if side == "good" else wt_cand
            rows[side].append(runner.measure(wt, f"{side}#{i}", configs))

    med = lambda v: sorted(v)[len(v) // 2]  # noqa: E731
    out = {"good": good_sha, "cand": cand_sha}
    for key in (f"c{c}_sps" for c in configs):
        a = [r[key] for r in rows["good"] if r.get(key)]
        b = [r[key] for r in rows["cand"] if r.get(key)]
        if a and b:
            out[key] = {
                "good": [round(x) for x in a],
                "cand": [round(x) for x in b],
                "cand_over_good": round(med(b) / med(a), 4),
            }
            log(f"{key}: cand/good = {med(b) / med(a):.3f} "
                f"(good {med(a):,.0f}, cand {med(b):,.0f})")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

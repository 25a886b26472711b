r"""Dipeptide-style MD workflow (counterpart of the reference's
examples/dipeptide/main.ipynb), fully native — no MDAnalysis/OpenMM needed.

Steps:
  1. build an alanine-dipeptide-like topology (22 atoms, 3 residues);
  2. synthesize an MD-like trajectory (rigid-body motion + internal noise +
     a slow torsional mode) and write/read it as DCD;
  3. select the 10 heavy atoms (``type C or type O or type N``), build the
     preprocessing layer: Kabsch alignment + position features (d_r = 30);
  4. train k=2 eigenfunctions of the transfer operator with lag time
     (reference main.ipynb cells 10-18);
  5. export the CV model as a StableHLO deployment artifact.

Run:  python examples/dipeptide.py [--epochs 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from colvarsfinder_tpu.core import EigenFunctionTask
from colvarsfinder_tpu.models import EigenFunctions
from colvarsfinder_tpu.ops import (
    AlignmentLayer,
    Feature,
    FeatureLayer,
    PreprocessingANN,
)
from colvarsfinder_tpu.utils import WeightedTrajectory
from colvarsfinder_tpu.utils.io import Topology, read_dcd, write_dcd


def build_topology() -> Topology:
    """22-atom ACE-ALA-NME-like topology with plausible geometry."""
    rng = np.random.default_rng(0)
    names = [
        "HH31", "CH3", "HH32", "HH33", "C", "O",          # ACE
        "N", "H", "CA", "HA", "CB", "HB1", "HB2", "HB3",  # ALA
        "C", "O",
        "N", "H", "CH3", "HH31", "HH32", "HH33",          # NME
    ]
    resids = [1] * 6 + [2] * 10 + [3] * 6
    resnames = ["ACE"] * 6 + ["ALA"] * 10 + ["NME"] * 6
    # a stretched backbone with jittered substituents (nm scale)
    pos = np.zeros((22, 3), dtype=np.float32)
    backbone = {1: 0, 4: 1, 6: 2, 8: 3, 14: 4, 16: 5, 18: 6}
    for i in range(22):
        if i in backbone:
            t = backbone[i]
            pos[i] = [0.14 * t, 0.05 * ((-1) ** t), 0.0]
        else:
            anchor = max((b for b in backbone if b <= i), default=1)
            pos[i] = pos[anchor] + 0.1 * rng.standard_normal(3)
    return Topology(names=names, resids=resids, resnames=resnames,
                    positions=pos, title="synthetic alanine dipeptide")


def synthesize_trajectory(top: Topology, n_frames: int, dt_ps: float,
                          outdir: str) -> str:
    """MD-like frames: slow two-state torsional mode + thermal noise +
    random rigid motions (so the alignment layer has real work)."""
    rng = np.random.default_rng(42)
    base = top.positions.copy()
    # slow hidden mode: Ornstein-Uhlenbeck switching that displaces the NME
    # cap along a circle — the 'reaction coordinate' the CV should find
    s = np.zeros(n_frames)
    for t in range(1, n_frames):
        s[t] = s[t - 1] - 0.05 * np.sin(2 * s[t - 1]) + 0.3 * rng.standard_normal()
    cap = [i for i, r in enumerate(top.resids) if r == 3]
    frames = np.repeat(base[None], n_frames, axis=0)
    frames[:, cap, 0] += 0.08 * np.cos(s)[:, None]
    frames[:, cap, 1] += 0.08 * np.sin(s)[:, None]
    frames += 0.01 * rng.standard_normal(frames.shape)
    # random rigid motions per frame
    for t in range(n_frames):
        A = rng.standard_normal((3, 3))
        Q, R = np.linalg.qr(A)
        Q = Q * np.sign(np.diag(R))
        if np.linalg.det(Q) < 0:
            Q[:, 0] = -Q[:, 0]
        frames[t] = frames[t] @ Q + rng.standard_normal(3)
    path = os.path.join(outdir, "md_traj.dcd")
    write_dcd(path, frames.astype(np.float32), dt_ps=dt_ps)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/cvf_dipeptide")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n-frames", type=int, default=20_000)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    top = build_topology()
    dcd_path = synthesize_trajectory(top, args.n_frames, dt_ps=10.0,
                                     outdir=args.outdir)
    coords, dt_ps = read_dcd(dcd_path)
    print(f"trajectory: {coords.shape} frames, dt={dt_ps:.1f} ps")

    # heavy atoms (reference main.ipynb cell 10 selectors)
    input_ag = top.select_atoms("type C or type O or type N")
    align_ag = top.select_atoms("type C or type O or type N")
    print(f"input atoms: {len(input_ag)} ({input_ag.names})")

    traj_obj = WeightedTrajectory(
        trajectory=coords[:, input_ag.ix, :],
        dt=dt_ps * 1e-3,  # ps -> ns, as the reference's MD branch does
        verbose=False,
    )

    # preprocessing: alignment + positions (d_r = 30)
    align = AlignmentLayer(
        align_ag.positions,
        align_indices=align_ag.indices_within(input_ag),
    )
    feat = FeatureLayer(
        [Feature("p1", "position", list(range(len(input_ag))))]
    )
    pp_layer = PreprocessingANN(align, feat)
    print(feat.get_feature_info())

    model = EigenFunctions([30, 20, 20, 20, 1], 2, seed=0)
    task = EigenFunctionTask(
        traj_obj, pp_layer, model,
        model_path=os.path.join(args.outdir, "training-output"),
        alpha=20.0, eig_weights=[1.0, 0.2], lag_tau=0.01, k=2,
        learning_rate=0.001, batch_size=10_000, num_epochs=args.epochs,
        test_ratio=0.2, save_model_every_step=0, verbose=False,
        tensorboard=False, seed=0,
    )
    task.train()
    print(task.train_loss_df.tail())

    cv = task.colvar_model()
    cv_ts = np.asarray(cv(traj_obj.trajectory[:1000].astype(np.float32)))
    print("CV on first 1000 frames: shape", cv_ts.shape,
          "ranges", cv_ts.min(0), cv_ts.max(0))

    from colvarsfinder_tpu.export import export_colvar

    export_colvar(cv, traj_obj.trajectory[:1].astype(np.float32),
                  os.path.join(args.outdir, "cv_artifact"))
    print("CV exported to", os.path.join(args.outdir, "cv_artifact"))


if __name__ == "__main__":
    main()

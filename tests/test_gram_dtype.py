"""bf16 Gram-storage mode (EigenFunctionTask gram_dtype='bfloat16').

The gram generator step is Gram-TRAFFIC-bound (benchmarks/
genphase_scan.py: ~3-4 traversals of the [B, d_r, d_r] M tensor per
step); storing M in bfloat16 halves that bound. Opt-in: M rounds to
bf16, so losses track the f32-gram run closely but not bitwise.
"""

import tempfile

import numpy as np

from colvarsfinder_tpu.core import EigenFunctionTask
from colvarsfinder_tpu.models import EigenFunctions
from colvarsfinder_tpu.ops import (
    AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
)
from colvarsfinder_tpu.utils import WeightedTrajectory


def _mk(traj, pp, gram_dtype, **over):
    kw = dict(
        alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=0.0, k=2,
        learning_rate=0.01, seed=0, batch_size=100, num_epochs=3,
        test_ratio=0.25, save_model_every_step=0, verbose=False,
        tensorboard=False, debug_mode=False, gram_dtype=gram_dtype,
    )
    kw.update(over)
    return EigenFunctionTask(
        traj, pp, EigenFunctions([12, 10, 1], k=2, seed=0),
        tempfile.mkdtemp(prefix="gramdt_"), **kw,
    )


def test_bf16_gram_tracks_f32_gram():
    rng = np.random.default_rng(0)
    ref = rng.standard_normal((4, 3)).astype(np.float32)
    traj = WeightedTrajectory(
        trajectory=(
            ref[None] + 0.2 * rng.standard_normal((400, 4, 3))
        ).astype(np.float32),
        weights=np.ones(400), dt=0.1, verbose=False,
    )
    pp = PreprocessingANN(
        AlignmentLayer(ref, align_indices=[0, 1, 2, 3]),
        FeatureLayer([Feature("p", "position", [0, 1, 2, 3])]),
    )
    t0 = _mk(traj, pp, None)
    t0.train()
    assert t0._gram
    l0 = np.asarray(t0.train_loss_df["loss"], float)

    t1 = _mk(traj, pp, "bfloat16")
    t1.train()
    assert t1._gram and t1._gram_dtype == "bfloat16"
    l1 = np.asarray(t1.train_loss_df["loss"], float)
    assert np.isfinite(l1).all()
    np.testing.assert_allclose(l1, l0, rtol=2e-2)

    # 'float32' normalizes to the default (no cast)
    t2 = _mk(traj, pp, "float32")
    assert t2._gram_dtype is None

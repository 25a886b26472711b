"""Tests for colvarsfinder_tpu.tune.autotune."""

import numpy as np
import pytest

from colvarsfinder_tpu import config
from colvarsfinder_tpu.core import AutoEncoderTask
from colvarsfinder_tpu.models import AutoEncoder
from colvarsfinder_tpu.tune import DEFAULT_VARIANTS, autotune
from colvarsfinder_tpu.utils import WeightedTrajectory


def _factory(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((128, 2)).astype(np.float32)
    traj = WeightedTrajectory(trajectory=x, dt=0.1)
    counter = {"n": 0}

    def factory(**overrides):
        counter["n"] += 1
        model = AutoEncoder([2, 6, 1], [1, 6, 2], seed=0)
        return AutoEncoderTask(
            traj, None, model, str(tmp_path / f"t{counter['n']}"),
            learning_rate=0.01, save_model_every_step=0, batch_size=32,
            num_epochs=2, test_ratio=0.25, seed=0, verbose=False,
            debug_mode=False, export_cv=False, tensorboard=False,
            **overrides,
        )

    return factory


def test_autotune_ranks_and_restores_config(tmp_path):
    prev_prec = config.matmul_precision()
    prev_cdt = config.compute_dtype_name()
    variants = [
        {},
        {"matmul_precision": "default"},
        {"compute_dtype": "bfloat16"},
    ]
    results = autotune(
        _factory(tmp_path), variants, reps=2, verbose=False
    )
    # config restored
    assert config.matmul_precision() == prev_prec
    assert config.compute_dtype_name() == prev_cdt
    # one result per variant, sorted fastest-first, all measured
    assert len(results) == 3
    times = [r.best_seconds for r in results]
    assert times == sorted(times)
    assert all(np.isfinite(r.best_seconds) for r in results)
    assert all(np.isfinite(r.final_train_loss) for r in results)
    # the baseline variant carries speedup 1.0 by construction
    base = next(r for r in results if r.overrides == {})
    assert base.speedup == pytest.approx(1.0)
    # override split: config keys never reach the factory
    bf16 = next(r for r in results if "compute_dtype" in r.overrides)
    assert bf16.ctor_overrides == {}
    assert bf16.config_overrides == {"compute_dtype": "bfloat16"}


def test_autotune_ctor_overrides_reach_factory(tmp_path):
    seen = []
    base_factory = _factory(tmp_path)

    def factory(**overrides):
        seen.append(dict(overrides))
        return base_factory(**overrides)

    results = autotune(
        factory, [{}, {"optimizer_name": "Adam"}], reps=1, verbose=False
    )
    assert {"optimizer_name": "Adam"} in seen
    pb = next(r for r in results if r.overrides)
    assert pb.ctor_overrides == {"optimizer_name": "Adam"}
    assert pb.config_overrides == {}


def test_autotune_apply_config(tmp_path):
    prev_cdt = config.compute_dtype_name()
    results = autotune(
        _factory(tmp_path), [{}, {"compute_dtype": "bfloat16"}],
        reps=1, verbose=False,
    )
    try:
        bf16 = next(r for r in results if r.config_overrides)
        bf16.apply_config()
        assert config.compute_dtype_name() == "bfloat16"
    finally:
        config.set_compute_dtype(prev_cdt)


def test_default_variants_shape():
    assert DEFAULT_VARIANTS[0] == {}
    assert all(isinstance(v, dict) for v in DEFAULT_VARIANTS)


def test_autotune_skips_failing_variant(tmp_path):
    base_factory = _factory(tmp_path)

    def factory(**overrides):
        if overrides.get("boom"):
            raise RuntimeError("unsupported variant")
        overrides.pop("boom", None)
        return base_factory(**overrides)

    results = autotune(
        factory, [{}, {"boom": True}, {"matmul_precision": "default"}],
        reps=1, verbose=False,
    )
    assert len(results) == 2
    assert all(not r.overrides.get("boom") for r in results)


def test_autotune_failing_baseline_raises(tmp_path):
    def factory(**overrides):
        raise RuntimeError("factory broken")

    with pytest.raises(RuntimeError, match="factory broken"):
        autotune(factory, [{}], reps=1, verbose=False)

"""bfloat16 mixed-precision compute mode (config.set_compute_dtype).

Master parameters stay float32; per-layer inputs/weights/activations run
in bfloat16; network output is cast back to float32 before the loss
statistics. Used for HBM-bandwidth-bound sweeps/training (measured ~2x on
TPU v5e at dipeptide scale, benchmarks/ensemble_layout_ab.py); relative
loss noise ~1e-2 versus float32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from colvarsfinder_tpu import config
from colvarsfinder_tpu.core import EigenFunctionTask
from colvarsfinder_tpu.models import EigenFunctions, create_sequential_nn
from colvarsfinder_tpu.models.module import stacked_mlp_apply
from colvarsfinder_tpu.parallel import train_hyperparameter_sweep
from colvarsfinder_tpu.utils import WeightedTrajectory

COMMON = dict(
    batch_size=64, num_epochs=3, test_ratio=0.25,
    save_model_every_step=0, verbose=False, tensorboard=False,
    debug_mode=False,
)


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    config.set_compute_dtype("float32")
    config.set_bf16_style("pure")


def _traj(seed, n=256, d=2):
    rng = np.random.default_rng(seed)
    return WeightedTrajectory(
        trajectory=rng.standard_normal((n, d)).astype(np.float32),
        weights=rng.uniform(0.5, 1.5, n), dt=0.1, verbose=False,
    )


def _task(tmp_path, tag, lag=0.2):
    model = EigenFunctions([2, 10, 1], k=2, seed=3)
    return EigenFunctionTask(
        _traj(0), None, model, str(tmp_path / tag),
        alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=lag, k=2,
        learning_rate=0.01, seed=0, **COMMON,
    )


def test_setter_validation():
    with pytest.raises(ValueError):
        config.set_compute_dtype("float16")
    config.set_default_dtype("float64")
    try:
        with pytest.raises(ValueError):
            config.set_compute_dtype("bfloat16")
    finally:
        config.set_default_dtype("float32")
    config.set_compute_dtype("bfloat16")
    assert config.compute_dtype() == jnp.bfloat16
    assert config.compute_dtype_name() == "bfloat16"
    assert config.numerics_key()[1] == "bfloat16"


def test_mlp_apply_mixed_precision_close_to_f32():
    net = create_sequential_nn([4, 16, 16, 3], seed=0)
    x = np.random.default_rng(0).standard_normal((32, 4)).astype(np.float32)
    y32 = np.asarray(net(x))
    config.set_compute_dtype("bfloat16")
    y16 = np.asarray(net(x))
    assert y16.dtype == np.float32  # cast back for the loss statistics
    # close to f32 but not identical (the mode actually engaged)
    assert np.max(np.abs(y16 - y32)) < 3e-2 * max(1.0, np.abs(y32).max())
    assert np.any(y16 != y32)


def test_stacked_mlp_apply_mixed_precision():
    model = EigenFunctions([3, 8, 1], k=2, seed=1)
    x = np.random.default_rng(1).standard_normal((16, 3)).astype(np.float32)
    y32 = np.asarray(stacked_mlp_apply(model.params, x, "tanh"))
    config.set_compute_dtype("bfloat16")
    y16 = np.asarray(stacked_mlp_apply(model.params, x, "tanh"))
    assert y16.dtype == np.float32
    np.testing.assert_allclose(y16, y32, atol=3e-2, rtol=3e-2)
    assert np.any(y16 != y32)


def test_bf16_style_validation():
    with pytest.raises(ValueError):
        config.set_bf16_style("fp8")
    config.set_bf16_style("acc32")
    assert config.bf16_style() == "acc32"
    assert config.numerics_key()[2] == "acc32"


@pytest.mark.parametrize("apply_stacked", [False, True])
def test_bf16_styles_tighten_numerics(apply_stacked):
    """'acc32' (f32 accumulation) and 'w32' (f32 weights too) must land
    strictly closer to the f32 forward pass than 'pure' — that per-pass
    ordering is what the styles guarantee. (Long training trajectories
    still drift under every style — chaotic sensitivity, measured in
    benchmarks/bf16_modes_ab.py — which is why 'pure' stays the
    default.)"""
    if apply_stacked:
        model = EigenFunctions([6, 16, 16, 1], k=2, seed=5)
        f = lambda x: np.asarray(stacked_mlp_apply(model.params, x, "tanh"))
    else:
        net = create_sequential_nn([6, 16, 16, 3], seed=5)
        f = lambda x: np.asarray(net(x))
    x = np.random.default_rng(7).standard_normal((512, 6)).astype(np.float32)
    y32 = f(x)
    errs = {}
    config.set_compute_dtype("bfloat16")
    for style in ("pure", "acc32", "w32"):
        config.set_bf16_style(style)
        y = f(x)
        assert y.dtype == np.float32
        errs[style] = float(np.abs(y - y32).max())
        assert errs[style] > 0  # the mode engaged
    assert errs["acc32"] < errs["pure"]
    assert errs["w32"] < errs["pure"]


@pytest.mark.slow
def test_bf16_style_task_cache_isolated(tmp_path):
    """Flipping the style between train() calls must retrace (numerics_key
    carries the style), and every style must train finitely and close to
    the f32 trajectory."""
    t32 = _task(tmp_path, "sf32")
    t32.train()
    l32 = t32.train_loss_df["loss"].to_numpy()
    config.set_compute_dtype("bfloat16")
    losses = {}
    for style in ("pure", "acc32"):
        config.set_bf16_style(style)
        t = _task(tmp_path, f"s_{style}")
        t.train()
        losses[style] = t.train_loss_df["loss"].to_numpy()
        assert np.all(np.isfinite(losses[style]))
        np.testing.assert_allclose(losses[style], l32, rtol=0.1, atol=0.05)
    # the two styles are genuinely different programs
    assert not np.array_equal(losses["pure"], losses["acc32"])


def test_gradients_stay_float32():
    model = EigenFunctions([2, 8, 1], k=2, seed=0)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((8, 2)), jnp.float32
    )
    config.set_compute_dtype("bfloat16")
    g = jax.grad(lambda m: (m(x) ** 2).sum())(model)
    for leaf in jax.tree_util.tree_leaves(g):
        assert leaf.dtype == jnp.float32


def test_task_trains_in_bf16_and_f32_cache_isolated(tmp_path):
    # f32 baseline
    t32 = _task(tmp_path, "f32")
    t32.train()
    l32 = t32.train_loss_df["loss"].to_numpy()

    # bf16 run: same task config, loose agreement, finite losses
    config.set_compute_dtype("bfloat16")
    t16 = _task(tmp_path, "bf16")
    t16.train()
    l16 = t16.train_loss_df["loss"].to_numpy()
    assert np.all(np.isfinite(l16))
    np.testing.assert_allclose(l16, l32, rtol=0.1, atol=0.05)
    assert not np.allclose(l16, l32, rtol=1e-7, atol=0)  # mode engaged
    for leaf in jax.tree_util.tree_leaves(t16.model):
        assert np.asarray(leaf).dtype == np.float32  # master weights

    # back to f32: compiled-program cache must NOT reuse the bf16 program
    config.set_compute_dtype("float32")
    t32b = _task(tmp_path, "f32b")
    t32b.train()
    np.testing.assert_array_equal(
        t32b.train_loss_df["loss"].to_numpy(), l32
    )


def test_sweep_compute_dtype_arg_restores_mode(tmp_path):
    task = _task(tmp_path, "sweep")
    grid = {"learning_rate": [0.005, 0.02], "alpha": [5.0, 20.0]}
    res32 = train_hyperparameter_sweep(task, grid)
    assert config.compute_dtype_name() == "float32"
    res16 = train_hyperparameter_sweep(
        task, grid, compute_dtype="bfloat16"
    )
    assert config.compute_dtype_name() == "float32"  # restored
    for r32, r16 in zip(res32, res16):
        a = r32.train_loss_df["loss"].to_numpy()
        b = r16.train_loss_df["loss"].to_numpy()
        assert np.all(np.isfinite(b))
        np.testing.assert_allclose(b, a, rtol=0.1, atol=0.05)

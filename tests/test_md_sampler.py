"""MD sampler (`integrate_md_langevin`) tests with a mocked OpenMM engine.

OpenMM is not installed in CI, so the wrapper (reference counterpart:
colvarsfinder/utils.py:172-255) is driven against duck-typed engine
objects, the same approach test_md_branch.py uses for MDAnalysis:

* wiring tests — minimization/equilibration/production call order,
  reporter construction (paths, intervals, CSV columns), PLUMED force
  addition, and the return contract;
* an END-TO-END pipeline test — a behavioral fake engine that actually
  integrates a random walk and drives real reporter objects which write a
  real DCD trajectory + statistics CSV, which then flow through the full
  reference data path: ``calc_weights`` -> ``Universe`` ->
  ``WeightedTrajectory`` -> ``EigenFunctionTask.train()``
  (reference consumption path: utils.py:96-130, main.ipynb cell 2).
"""

import sys
import types

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# wiring-level fakes (call recording only)
# ---------------------------------------------------------------------------


class _FakeSimulation:
    instances = []

    def __init__(self, topology, system, integrator):
        self.topology, self.system, self.integrator = (
            topology, system, integrator,
        )
        self.context = types.SimpleNamespace(
            setPositions=lambda p: None,
            getPlatform=lambda: types.SimpleNamespace(
                getName=lambda: "Fake"
            ),
        )
        self.minimized = False
        self.step_calls = []
        self.reporters = []
        _FakeSimulation.instances.append(self)

    def minimizeEnergy(self):
        self.minimized = True

    def step(self, n):
        self.step_calls.append(n)


@pytest.fixture
def fake_openmm(monkeypatch):
    _FakeSimulation.instances = []
    reporter_log = []

    def _reporter(kind):
        class R:
            def __init__(self, target, interval, **kw):
                reporter_log.append((kind, target, interval, kw))
        return R

    app = types.ModuleType("openmm.app")
    app.Simulation = _FakeSimulation
    app.DCDReporter = _reporter("dcd")
    app.StateDataReporter = _reporter("state")
    openmm_mod = types.ModuleType("openmm")
    openmm_mod.app = app

    plumed_forces = []

    class PlumedForce:
        def __init__(self, script):
            self.script = script
            plumed_forces.append(self)

    plumed = types.ModuleType("openmmplumed")
    plumed.PlumedForce = PlumedForce

    monkeypatch.setitem(sys.modules, "openmm", openmm_mod)
    monkeypatch.setitem(sys.modules, "openmm.app", app)
    monkeypatch.setitem(sys.modules, "openmmplumed", plumed)
    return types.SimpleNamespace(
        reporters=reporter_log, plumed_forces=plumed_forces
    )


def test_integrate_md_langevin_basic(tmp_path, fake_openmm):
    from colvarsfinder_tpu.utils.sampling import integrate_md_langevin

    added_forces = []
    system = types.SimpleNamespace(addForce=added_forces.append)
    pdb = types.SimpleNamespace(topology="top", positions="pos")

    dcd, csv, elapsed = integrate_md_langevin(
        pdb, system, "integrator", n_steps=1000,
        sampling_output_path=str(tmp_path / "md"),
        report_interval=20, report_interval_stdout=50, verbose=False,
    )
    sim = _FakeSimulation.instances[-1]
    assert sim.minimized
    assert sim.step_calls == [1000]  # no equilibration call when pre_steps=0
    assert len(sim.reporters) == 3
    assert not added_forces  # no plumed bias requested
    # return contract: production artifact paths + elapsed seconds
    assert dcd.endswith("traj.dcd") and csv.endswith("output.csv")
    assert isinstance(elapsed, float) and elapsed >= 0
    kinds = [r[0] for r in fake_openmm.reporters]
    assert kinds.count("dcd") == 1 and kinds.count("state") == 2
    dcd_call = next(r for r in fake_openmm.reporters if r[0] == "dcd")
    assert dcd_call[1] == dcd and dcd_call[2] == 20
    # the CSV reporter must record the columns calc_weights consumes
    # downstream (time + potential energy in column 1)
    csv_call = next(
        r for r in fake_openmm.reporters
        if r[0] == "state" and r[1] == csv
    )
    assert csv_call[2] == 20
    assert csv_call[3].get("time") and csv_call[3].get("potentialEnergy")


def test_integrate_md_langevin_plumed_and_equilibration(
    tmp_path, fake_openmm
):
    from colvarsfinder_tpu.utils.sampling import integrate_md_langevin

    added_forces = []
    system = types.SimpleNamespace(addForce=added_forces.append)
    pdb = types.SimpleNamespace(topology="top", positions="pos")

    integrate_md_langevin(
        pdb, system, "integrator", n_steps=500,
        sampling_output_path=str(tmp_path / "md2"),
        pre_steps=200, plumed_script="UNITS LENGTH=A", verbose=False,
    )
    sim = _FakeSimulation.instances[-1]
    # equilibration runs before reporters attach, then production
    assert sim.step_calls == [200, 500]
    assert sim.reporters, "reporters must be attached for production"
    assert len(added_forces) == 1
    assert fake_openmm.plumed_forces[0].script == "UNITS LENGTH=A"


def test_integrate_md_langevin_missing_openmm(tmp_path, monkeypatch):
    for mod in ("openmm", "openmm.app"):
        monkeypatch.setitem(sys.modules, mod, None)
    from colvarsfinder_tpu.utils.sampling import integrate_md_langevin

    with pytest.raises(ImportError, match="integrate_sde_overdamped"):
        integrate_md_langevin(
            None, None, None, n_steps=1,
            sampling_output_path=str(tmp_path), verbose=False,
        )


# ---------------------------------------------------------------------------
# behavioral fake engine: end-to-end pipeline through real artifacts
# ---------------------------------------------------------------------------


class _EngineSimulation:
    """Fake engine that actually integrates (a bounded random walk) and
    drives its reporters the way OpenMM does: every reporter is called at
    its own interval with the current state."""

    def __init__(self, topology, system, integrator):
        self.topology = topology
        self.system = system
        self.integrator = integrator
        self._positions = None
        self._step = 0
        self._rng = np.random.default_rng(42)
        self.reporters = []
        self.context = types.SimpleNamespace(
            setPositions=self._set_positions,
            getPlatform=lambda: types.SimpleNamespace(
                getName=lambda: "FakeEngine"
            ),
        )

    def _set_positions(self, pos):
        self._positions = np.asarray(pos, dtype=np.float32).copy()

    def minimizeEnergy(self):
        pass

    def step(self, n):
        for _ in range(int(n)):
            self._step += 1
            self._positions = self._positions + 0.01 * self._rng.standard_normal(
                self._positions.shape
            ).astype(np.float32)
            for rep in self.reporters:
                if self._step % rep.interval == 0:
                    rep.report(self)


class _EngineDCDReporter:
    """Writes a REAL DCD file (via the framework's standard-compliant
    writer) as frames are reported — the artifact Universe reads back."""

    def __init__(self, path, interval, dt_ps=2.0):
        self.path, self.interval, self.dt_ps = path, int(interval), dt_ps
        self._frames = []

    def report(self, sim):
        from colvarsfinder_tpu.utils import write_dcd

        self._frames.append(sim._positions.copy())
        write_dcd(
            self.path, np.stack(self._frames), dt_ps=self.dt_ps,
            step_interval=self.interval,
        )


class _EngineStateReporter:
    """Writes the statistics CSV rows calc_weights consumes."""

    def __init__(self, target, interval, **kw):
        self.target, self.interval = target, int(interval)
        self._is_file = isinstance(target, str)
        self.n_reports = 0
        if self._is_file:
            with open(target, "w") as f:
                f.write(
                    '#"Time (ps)","Potential Energy (kJ/mole)",'
                    '"Total Energy (kJ/mole)","Temperature (K)"\n'
                )

    def report(self, sim):
        self.n_reports += 1
        if self._is_file:
            pot = float((sim._positions ** 2).sum())
            with open(self.target, "a") as f:
                f.write(
                    f"{sim._step * 0.002:.4f},{pot:.6f},"
                    f"{pot + 1.0:.6f},300.0\n"
                )


@pytest.fixture
def behavioral_openmm(monkeypatch):
    app = types.ModuleType("openmm.app")
    app.Simulation = _EngineSimulation
    app.DCDReporter = _EngineDCDReporter
    app.StateDataReporter = _EngineStateReporter
    openmm_mod = types.ModuleType("openmm")
    openmm_mod.app = app
    monkeypatch.setitem(sys.modules, "openmm", openmm_mod)
    monkeypatch.setitem(sys.modules, "openmm.app", app)


def test_md_pipeline_end_to_end(tmp_path, behavioral_openmm):
    """The full reference MD workflow with the engine mocked: sample ->
    DCD+CSV -> calc_weights -> Universe -> WeightedTrajectory ->
    EigenFunctionTask.train() (reference utils.py:96-130 + main.ipynb)."""
    from test_io import GRO_TEXT

    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import Feature, FeatureLayer
    from colvarsfinder_tpu.utils import (
        Universe,
        WeightedTrajectory,
        calc_weights,
    )
    from colvarsfinder_tpu.utils.io import parse_gro
    from colvarsfinder_tpu.utils.sampling import integrate_md_langevin

    gro = tmp_path / "top.gro"
    gro.write_text(GRO_TEXT)
    top = parse_gro(str(gro))
    pdb = types.SimpleNamespace(
        topology="top", positions=top.positions
    )
    system = types.SimpleNamespace(addForce=lambda f: None)

    out = tmp_path / "md_out"
    dcd_path, csv_path, _ = integrate_md_langevin(
        pdb, system, "integrator", n_steps=1000,
        sampling_output_path=str(out),
        pre_steps=100, report_interval=20, report_interval_stdout=500,
        verbose=False,
    )

    # reweight from the CSV's potential-energy column (reference
    # utils.py:354-417 semantics)
    wfile = str(out / "weights.txt")
    w = calc_weights(csv_path, sampling_beta=1.0, sys_beta=1.2,
                     traj_weight_filename=wfile, verbose=False)
    assert w.shape == (50,) and abs(w.mean() - 1.0) < 1e-12

    u = Universe(str(gro), dcd_path)
    traj_obj = WeightedTrajectory(
        universe=u, weight_filename=wfile, verbose=False
    )
    assert traj_obj.trajectory.shape == (50, 22, 3)
    assert traj_obj.dt == pytest.approx(2.0e-3)  # 2 ps -> ns

    feat = FeatureLayer([Feature("p", "position", [1, 4, 6, 8])])
    model = EigenFunctions([12, 10, 1], k=1, seed=0)
    task = EigenFunctionTask(
        traj_obj, feat, model, str(tmp_path / "train"),
        alpha=10.0, eig_weights=[1.0], lag_tau=2 * traj_obj.dt, k=1,
        learning_rate=0.01, batch_size=16, num_epochs=2, test_ratio=0.25,
        save_model_every_step=0, verbose=False, tensorboard=False,
        debug_mode=False, seed=0,
    )
    task.train()
    losses = task.train_loss_df["loss"].to_numpy()
    assert np.isfinite(losses).all()

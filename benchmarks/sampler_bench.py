"""SDE sampler throughput: one-scan TPU integrator vs the reference loop.

Measures ``integrate_sde_overdamped`` (this framework: whole integration
as ONE jitted ``lax.scan``, optionally vmapped chains) against the actual
reference package's sampler (per-step Python callback,
/root/reference/colvarsfinder/utils.py:257-352) on the 2d.ipynb workload
shape: the triple-well-on-a-circle potential, N integrator steps,
report_interval=100.

Run on the TPU host:  python benchmarks/sampler_bench.py
Flags: --steps N (default 500000, the 2d.ipynb cell-6 size), --chains C
(default 32 for the vmapped row), --ref-steps (default 50000 — the
reference is ~3 orders slower; its rate is extrapolated per step).
"""

import argparse
import math
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class TripleWellJax:
    dim = 2
    beta = 1.0

    def V(self, x):
        import jax.numpy as jnp

        theta = jnp.arctan2(x[1], x[0])
        r = jnp.sqrt(x[0] ** 2 + x[1] ** 2)
        return 2.0 * jnp.cos(3.0 * theta) + 10.0 * (r - 1.0) ** 2


class TripleWellNumpy:
    """Same potential for the reference sampler (single-state numpy
    contract of reference utils.py:283-292: x is [d], V scalar)."""

    dim = 2
    beta = 1.0

    def V(self, x):
        theta = np.arctan2(x[1], x[0])
        r = np.sqrt(x[0] ** 2 + x[1] ** 2)
        return 2.0 * np.cos(3.0 * theta) + 10.0 * (r - 1.0) ** 2

    def gradV(self, x):
        x1, x2 = x[0], x[1]
        r2 = x1**2 + x2**2
        r = np.sqrt(r2)
        theta = np.arctan2(x2, x1)
        dv_dtheta = -6.0 * np.sin(3.0 * theta)
        dv_dr = 20.0 * (r - 1.0)
        # dtheta/dx = (-x2, x1)/r^2 ; dr/dx = (x1, x2)/r
        gx = dv_dtheta * (-x2 / r2) + dv_dr * (x1 / r)
        gy = dv_dtheta * (x1 / r2) + dv_dr * (x2 / r)
        return np.array([gx, gy])


def bench_ours(n_steps, n_chains, reps=3):
    import jax

    from colvarsfinder_tpu.utils import integrate_sde_overdamped

    pot = TripleWellJax()
    out = tempfile.mkdtemp()
    kw = dict(
        X0=np.array([1.0, 0.0]),
        step_size=0.001,
        report_interval=100,
        seed=1,
        n_chains=n_chains,
        verbose=False,
    )
    # warm the jit cache
    integrate_sde_overdamped(pot, n_steps, out, **kw)
    best = math.inf
    for _ in range(reps):
        t0 = time.time()
        integrate_sde_overdamped(pot, n_steps, out, **kw)
        best = min(best, time.time() - t0)
    return n_steps * n_chains / best


def bench_reference(n_steps):
    import tempfile as tf

    stub = tf.mkdtemp()
    pkg = os.path.join(stub, "openmm")
    os.makedirs(pkg, exist_ok=True)
    with open(os.path.join(pkg, "__init__.py"), "w") as f:
        f.write("class unit:\n    pass\n")
    with open(os.path.join(pkg, "app.py"), "w") as f:
        f.write("")
    sys.path.insert(0, stub)
    sys.path.insert(0, "/root/reference")
    import colvarsfinder.utils as ref_utils

    pot = TripleWellNumpy()
    out = tf.mkdtemp()
    t0 = time.time()
    ref_utils.integrate_sde_overdamped(
        pot, n_steps, out, X0=np.array([1.0, 0.0]),
        step_size=0.001, report_interval=100,
        report_interval_stdout=10**9,
    )
    return n_steps / (time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500_000)
    ap.add_argument("--chains", type=int, default=32)
    ap.add_argument("--ref-steps", type=int, default=50_000)
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    r1 = bench_ours(args.steps, 1)
    rC = bench_ours(args.steps, args.chains)
    print(f"ours[{backend}] 1 chain:  {r1:,.0f} steps/s")
    print(f"ours[{backend}] {args.chains} chains: {rC:,.0f} chain-steps/s")

    ref = bench_reference(args.ref_steps)
    print(f"reference (numpy loop): {ref:,.0f} steps/s")
    print(
        f"speedup: {r1 / ref:,.1f}x single-chain, "
        f"{rC / ref:,.1f}x at {args.chains} vmapped chains"
    )


if __name__ == "__main__":
    main()

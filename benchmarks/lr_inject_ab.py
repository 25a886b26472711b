"""Micro A/B on the real chip: injected-lr optimizer (current) vs
static-lr optimizer (round-2) on the c1 toy AE multi-epoch program —
interleaved in one process."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp, optax
from functools import partial
from colvarsfinder_tpu.core.losses import weighted_mse_loss
from colvarsfinder_tpu.models import AutoEncoder

rng = np.random.default_rng(30)
N, B, EPOCHS = 5000, 1000, 200
theta = rng.uniform(-np.pi, np.pi, N); r = 1 + 0.15*rng.standard_normal(N)
x = np.stack([r*np.cos(theta), r*np.sin(theta)], 1).astype(np.float32)
w = np.ones(N, np.float32)
nt = 4000
Xtr = jnp.asarray(x[:nt].reshape(4, B, 2)); wtr = jnp.asarray(w[:nt].reshape(4, B))
Xte = jnp.asarray(x[nt:].reshape(1, B, 2)); wte = jnp.asarray(w[nt:].reshape(1, B))
model = AutoEncoder([2,20,20,20,1],[1,20,20,2],seed=0)

def build(opt):
    @partial(jax.jit, static_argnames="n")
    def run(m, s, n):
        def epoch(carry, _):
            m, s = carry
            tl = []
            # unrolled 4+1 batches like the task's unroll layout
            for i in range(4):
                loss, g = jax.value_and_grad(weighted_mse_loss)(m, Xtr[i], wtr[i])
                u, s = opt.update(g, s, m)
                m = optax.apply_updates(m, u)
                tl.append(loss)
            te = [weighted_mse_loss(m, Xte[0], wte[0])]
            return (m, s), (jnp.stack(tl), jnp.stack(te))
        (m, s), ms = jax.lax.scan(epoch, (m, s), None, length=n)
        return m, s, ms
    return run

inj = optax.inject_hyperparams(optax.adam)(0.005, b1=0.9, b2=0.999, eps=1e-8)
sta = optax.adam(0.005, b1=0.9, b2=0.999, eps=1e-8)
run_inj, run_sta = build(inj), build(sta)
si, ss = inj.init(model), sta.init(model)

def meas(run, s, reps=3):
    m = model
    out = run(m, s, EPOCHS); np.asarray(out[2][0])  # compile+warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = run(m, s, EPOCHS); np.asarray(o[2][0])
        best = min(best, time.perf_counter()-t0)
    return EPOCHS*4*B/best

for rnd in range(3):
    a = meas(run_inj, si); b = meas(run_sta, ss)
    print(f"round {rnd}: injected {a:,.0f} sps  static {b:,.0f} sps  static/injected = {b/a:.3f}", flush=True)

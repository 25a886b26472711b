"""Same-process A/B at 2D-TOY scale: generator per-sample input
gradients as jacrev-of-batched-sums (current) vs vmap(jacrev(single))
(round-2 formulation). Dipeptide scale measured batched +5%; the toy
configs are dispatch/small-kernel bound and may prefer vmap."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, optax
from functools import partial
from colvarsfinder_tpu.models import EigenFunctions

rng = np.random.default_rng(30)
N, B, EPOCHS, k = 5000, 1000, 200, 1
theta = rng.uniform(-np.pi, np.pi, N); r = 1 + 0.15*rng.standard_normal(N)
x = np.stack([r*np.cos(theta), r*np.sin(theta)], 1).astype(np.float32)
Xb = jnp.asarray(x[:4000].reshape(4, B, 2))
wb = jnp.ones((4, B), jnp.float32)
model0 = EigenFunctions([2, 20, 20, 20, 1], k=k, seed=0)
opt = optax.adam(0.005)

def make_loss(formulation):
    def grad_sq(m, X):
        if formulation == "batched":
            jac = jax.jacrev(lambda Xq: m(Xq).sum(axis=0))(X)  # [k,B,2]
            return (jac**2).sum(-1).T
        def f_single(xx):
            return m(xx[None])[0]
        jac = jax.vmap(jax.jacrev(f_single))(X)  # [B,k,2]
        return (jac**2).reshape(X.shape[0], k, -1).sum(-1)
    def loss(m, X, w):
        y = m(X)
        mu = (w[:, None]*y).mean(0); var = (w[:, None]*(y-mu)**2).mean(0)
        gs = grad_sq(m, X)
        lam = (w[:, None]*gs).mean(0)/var
        pen = ((var-1.0)**2).sum()
        return lam.sum() + 20.0*pen
    return loss

def build(formulation):
    loss = make_loss(formulation)
    @partial(jax.jit, static_argnames="n")
    def run(m, s, n):
        def epoch(carry, _):
            m, s = carry
            for i in range(4):
                l, g = jax.value_and_grad(loss)(m, Xb[i], wb[i])
                u, s = opt.update(g, s, m)
                m = optax.apply_updates(m, u)
            return (m, s), l
        (m, s), ls = jax.lax.scan(epoch, (m, s), None, length=n)
        return m, s, ls
    return run

runs = {f: build(f) for f in ("batched", "vmap")}
state = opt.init(model0)
def meas(run, reps=3):
    o = run(model0, state, EPOCHS); np.asarray(o[2])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); o = run(model0, state, EPOCHS); np.asarray(o[2])
        best = min(best, time.perf_counter() - t0)
    return EPOCHS*4*B/best

for rnd in range(3):
    a = meas(runs["batched"]); b = meas(runs["vmap"])
    print(f"round {rnd}: batched {a:,.0f} sps  vmap(jacrev) {b:,.0f} sps  vmap/batched = {b/a:.3f}", flush=True)

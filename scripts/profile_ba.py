"""Decompose BA LM iteration cost on TPU: jacobians, operator build, matvec, PCG."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from bench import bench_ba  # reuse problem construction
from sfm_tpu.config import BAConfig
from sfm_tpu.ba.problem import build_problem
from sfm_tpu.ba.residuals import residuals_and_jacobians, huber_weights
from sfm_tpu.ba.schur import build_operator, schur_matvec, pcg_solve

rng = np.random.default_rng(0)
n_cams, n_pts, obs_per_cam = 100, 20000, 2000
pts = rng.uniform(-3, 3, (n_pts, 3)).astype(np.float32); pts[:, 2] += 10
rvec = 0.02*rng.normal(size=(n_cams,3)).astype(np.float32)
tvec = np.concatenate([rng.uniform(-2,2,(n_cams,2)), np.zeros((n_cams,1))],1).astype(np.float32)
intr = np.array([1200.,1200.,512.,384.], np.float32)
obs_cam = np.repeat(np.arange(n_cams, dtype=np.int32), obs_per_cam)
obs_point = rng.integers(0, n_pts, n_cams*obs_per_cam).astype(np.int32)
obs_xy = rng.uniform(0, 1024, (len(obs_cam), 2)).astype(np.float32)

args = (jnp.asarray(rvec), jnp.asarray(tvec), jnp.asarray(intr), jnp.asarray(pts),
        jnp.asarray(obs_cam), jnp.asarray(obs_point), jnp.asarray(obs_xy))

def sync(r):
    return float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))

def timeit(f, n=5):
    sync(f()); sync(f())
    t0=time.time()
    for _ in range(n): r = f()
    sync(r)
    return (time.time()-t0)/n*1e3

jac = jax.jit(residuals_and_jacobians)
print('jacobians:     %.1f ms' % timeit(lambda: jac(args)), flush=True)
r, Jc, Jk, Jp = jac(args)
w = huber_weights(r, 2.0)
ov = jnp.ones(len(obs_cam))
cf = jnp.ones(n_cams)
pv = jnp.ones(n_pts, bool)
Hreg = jnp.eye(4)
bop = jax.jit(lambda: build_operator(Jc, Jk, Jp, r, w, args[4], args[5], ov, cf, pv, jnp.float32(1e-3), Hreg, n_cams, n_pts))
print('build_operator: %.1f ms' % timeit(bop), flush=True)
op, rhs_c, rhs_k, g_p = bop()
mv = jax.jit(lambda x: schur_matvec(op, x, jnp.zeros(4)))
x0 = jnp.ones((n_cams, 6))
print('matvec:        %.2f ms' % timeit(lambda: mv(x0), n=20), flush=True)
pcg = jax.jit(lambda: pcg_solve(op, rhs_c, rhs_k, 30, 1e-6))
print('pcg(30):       %.1f ms' % timeit(pcg), flush=True)

"""Locate the sweep's wall-clock: dispatch latency vs compute, per stage."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from sfm_tpu.config import SfMConfig
from sfm_tpu.matching.sweep import _sweep_chunk_fn, candidate_pairs
from sfm_tpu.matching.core import _match_descriptors
from sfm_tpu.estimators.fundamental import estimate_fundamental_ransac

z = np.load('/tmp/bunny_feats_bench.npz')
xy, desc, valid = z['xy'], z['desc'], z['valid']
cfg = SfMConfig()
xy_d, desc_d, valid_d = jnp.asarray(xy), jnp.asarray(desc), jnp.asarray(valid)
pairs = candidate_pairs(36)
keys = jax.random.split(jax.random.key(0), 1024)

def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))

def timeit(f, n=10):
    f(); sync(f())
    t0 = time.time()
    for _ in range(n):
        r = f()
    s = sync(r)
    return (time.time() - t0) / n * 1e3

# 1. full chunk (32 pairs)
fn = jax.jit(_sweep_chunk_fn(cfg))
ch = jnp.asarray(pairs[:32])
t_chunk = timeit(lambda: fn(keys[:32], ch, xy_d, desc_d, valid_d), n=10)
print('full chunk32: %.1f ms (%.2f ms/pair)' % (t_chunk, t_chunk/32), flush=True)

# 2. matching only (vmapped 32)
mfn = jax.jit(jax.vmap(lambda a, va, b, vb: _match_descriptors(a, va, b, vb, max_matches=1024)))
i, j = pairs[:32, 0], pairs[:32, 1]
t_m = timeit(lambda: mfn(desc_d[i], valid_d[i], desc_d[j], valid_d[j]))
print('match32:      %.1f ms' % t_m, flush=True)

# 3. F-RANSAC only (vmapped 32) on random points
rng = np.random.default_rng(0)
p1 = jnp.asarray(rng.uniform(0, 1024, (32, 1024, 2)).astype(np.float32))
p2 = jnp.asarray(rng.uniform(0, 1024, (32, 1024, 2)).astype(np.float32))
vv = jnp.asarray(np.arange(1024)[None, :] < 150 * np.ones((32, 1)))
rfn = jax.jit(jax.vmap(lambda k, a, b, v: estimate_fundamental_ransac(
    k, a, b, v, iters=cfg.verify.ransac_iters, prefix_valid=True, score_budget=256)))
t_r = timeit(lambda: rfn(keys[:32], p1, p2, vv))
print('ransac32:     %.1f ms' % t_r, flush=True)

# 4. dispatch latency: trivial jitted op round trip
tiny = jax.jit(lambda x: x + 1)
t_d = timeit(lambda: tiny(jnp.zeros((8, 8))), n=20)
print('tiny op:      %.1f ms' % t_d, flush=True)

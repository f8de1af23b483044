"""Decompose the matcher's per-chunk cost on TPU."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from sfm_tpu.ops.match_topk import match_top2_pallas, match_top2_reference
from sfm_tpu.matching.core import _match_descriptors

z = np.load('/tmp/bunny_feats_bench.npz')
desc, valid = jnp.asarray(z['desc']), jnp.asarray(z['valid'])
i = jnp.arange(32) % 36
j = (jnp.arange(32) + 7) % 36
d1, v1, d2, v2 = desc[i], valid[i], desc[j], valid[j]

def sync(r):
    return float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))

def timeit(f, n=10):
    sync(f()); sync(f())
    t0 = time.time()
    for _ in range(n): r = f()
    sync(r)
    return (time.time()-t0)/n*1e3

p2 = jax.jit(jax.vmap(lambda a, b, v: match_top2_pallas(a, b, v)))
print('pallas top2 x32:    %.1f ms' % timeit(lambda: p2(d1, d2, v2)), flush=True)
r2 = jax.jit(jax.vmap(match_top2_reference))
print('jnp top2 x32:       %.1f ms' % timeit(lambda: r2(d1, d2, v2)), flush=True)
mm = jax.jit(jax.vmap(lambda a, b: jnp.dot(a, b.T)))
print('raw matmul x32:     %.1f ms' % timeit(lambda: mm(d1, d2)), flush=True)

full_p = jax.jit(jax.vmap(lambda a, va, b, vb: _match_descriptors(a, va, b, vb, max_matches=1024, use_pallas=True)))
print('match pallas x32:   %.1f ms' % timeit(lambda: full_p(d1, v1, d2, v2)), flush=True)
full_j = jax.jit(jax.vmap(lambda a, va, b, vb: _match_descriptors(a, va, b, vb, max_matches=1024, use_pallas=False)))
print('match jnp x32:      %.1f ms' % timeit(lambda: full_j(d1, v1, d2, v2)), flush=True)
# compaction top_k alone
score = jax.random.uniform(jax.random.key(0), (32, 2048))
tk = jax.jit(lambda s: jax.lax.top_k(s, 1024))
print('topk 2048->1024 x32: %.1f ms' % timeit(lambda: tk(score)), flush=True)

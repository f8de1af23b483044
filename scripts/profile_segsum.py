"""Which segment-reduction strategy is fastest on this TPU?"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp

O, C, P = 200_000, 100, 20_000
rng = np.random.default_rng(0)
vals = jnp.asarray(rng.normal(size=(O, 6)).astype(np.float32))
cam = jnp.asarray(rng.integers(0, C, O).astype(np.int32))
pt_sorted = jnp.asarray(np.sort(rng.integers(0, P, O)).astype(np.int32))

def sync(r): return float(jnp.sum(jax.tree.leaves(r)[0]))
def timeit(f, n=20):
    sync(f()); sync(f())
    t0=time.time()
    for _ in range(n): r=f()
    sync(r); return (time.time()-t0)/n*1e3

seg_c = jax.jit(lambda v: jax.ops.segment_sum(v, cam, num_segments=C))
print('segment_sum cams:    %.2f ms' % timeit(lambda: seg_c(vals)), flush=True)
onehot_c = jax.jit(lambda v: jax.nn.one_hot(cam, C, dtype=v.dtype).T @ v)
print('one-hot matmul cams: %.2f ms' % timeit(lambda: onehot_c(vals)), flush=True)
seg_p = jax.jit(lambda v: jax.ops.segment_sum(v, pt_sorted, num_segments=P))
print('segment_sum pts:     %.2f ms' % timeit(lambda: seg_p(vals)), flush=True)

# sorted cumsum-reduceat for points
starts = jnp.searchsorted(pt_sorted, jnp.arange(P))
def cumsum_seg(v):
    cs = jnp.concatenate([jnp.zeros((1, v.shape[1]), v.dtype), jnp.cumsum(v, axis=0)])
    ends = jnp.concatenate([starts[1:], jnp.array([O])])
    return cs[ends] - cs[starts]
cs_p = jax.jit(cumsum_seg)
ref = np.asarray(seg_p(vals)); got = np.asarray(cs_p(vals))
print('cumsum pts parity:', np.abs(ref-got).max() < 2e-1, '   %.2f ms' % timeit(lambda: cs_p(vals)), flush=True)

# gathers
gat = jax.jit(lambda x: x[cam])
xc = jnp.asarray(rng.normal(size=(C, 6)).astype(np.float32))
print('gather (O,6) by cam: %.2f ms' % timeit(lambda: gat(xc)), flush=True)
Vinv = jnp.asarray(rng.normal(size=(P, 3, 3)).astype(np.float32))
gat2 = jax.jit(lambda x: x[pt_sorted])
print('gather (O,3,3) by pt:%.2f ms' % timeit(lambda: gat2(Vinv)), flush=True)

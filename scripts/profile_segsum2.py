"""Amortized (in-jit scan) timing of segment-reduction strategies."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp

O, C, P, REP = 200_000, 100, 20_000, 50
rng = np.random.default_rng(0)
vals = jnp.asarray(rng.normal(size=(O, 6)).astype(np.float32))
cam = jnp.asarray(rng.integers(0, C, O).astype(np.int32))
pt_sorted = jnp.asarray(np.sort(rng.integers(0, P, O)).astype(np.int32))
starts = jnp.searchsorted(pt_sorted, jnp.arange(P))
ends = jnp.concatenate([starts[1:], jnp.array([O])])
onehot_cam = jax.nn.one_hot(cam, C, dtype=jnp.float32)  # precomputed (O, C)

def amortized(fn):
    @jax.jit
    def run(v):
        def body(carry, _):
            out = fn(v + carry)  # dependency prevents CSE
            return jnp.sum(out) * 1e-20, out
        c, outs = jax.lax.scan(body, 0.0, None, length=REP)
        return c
    float(run(vals)); float(run(vals))
    t0 = time.time()
    float(run(vals))
    return (time.time()-t0)/REP*1e3

print('segment_sum cams:  %.3f ms' % amortized(lambda v: jax.ops.segment_sum(v, cam, num_segments=C)), flush=True)
print('one-hot mm cams:   %.3f ms' % amortized(lambda v: onehot_cam.T @ v), flush=True)
print('segment_sum pts:   %.3f ms' % amortized(lambda v: jax.ops.segment_sum(v, pt_sorted, num_segments=P)), flush=True)
def cumsum_seg(v):
    cs = jnp.concatenate([jnp.zeros((1, v.shape[1]), v.dtype), jnp.cumsum(v, axis=0)])
    return cs[ends] - cs[starts]
print('cumsum pts:        %.3f ms' % amortized(cumsum_seg), flush=True)
xc = jnp.asarray(rng.normal(size=(C, 6)).astype(np.float32))
print('gather by cam:     %.3f ms' % amortized(lambda v: xc[cam] + v), flush=True)
Vv = jnp.asarray(rng.normal(size=(P, 9)).astype(np.float32))
print('gather by pt:      %.3f ms' % amortized(lambda v: Vv[pt_sorted][:, :6] + v), flush=True)
print('elementwise ref:   %.3f ms' % amortized(lambda v: v * 1.0001 + 1.0), flush=True)

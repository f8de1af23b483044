"""Is block_until_ready trustworthy over the axon tunnel? Time a known-FLOP
matmul chain with (a) block_until_ready, (b) scalar transfer."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp

@jax.jit
def chain(x):
    for _ in range(50):
        x = (x @ x) / jnp.linalg.norm(x)
    return x

x = jnp.asarray(np.random.default_rng(0).normal(size=(4096, 4096)).astype(np.float32))
# 50 matmuls of 4096^3*2 = 6.9 TFLOP total
r = chain(x); jax.block_until_ready(r)  # compile
for trial in range(3):
    t0 = time.time(); r = chain(x); jax.block_until_ready(r)
    t_block = time.time() - t0
    t0 = time.time(); s = float(jnp.sum(r))
    t_scalar = time.time() - t0
    print('block_until_ready: %.3fs   scalar-transfer after: %.3fs   (total %.3fs -> %.1f TFLOP/s)'
          % (t_block, t_scalar, t_block + t_scalar, 6.9 / (t_block + t_scalar)), flush=True)

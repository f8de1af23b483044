"""Compile + runtime of the matcher under vmap, jnp vs Pallas paths."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.matching.core import _match_descriptors


def main():
    rng = np.random.default_rng(0)
    K, D = 2048, 128
    for B in (4, 16, 32):
        d = rng.normal(size=(B, K, D)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        v = np.ones((B, K), bool)
        dj = jnp.asarray(d)
        dj2 = jnp.asarray(d[::-1].copy())
        vj = jnp.asarray(v)
        for up in (False, True):
            fn = jax.jit(
                jax.vmap(
                    lambda a, va, b, vb: _match_descriptors(
                        a, va, b, vb, max_matches=1024, use_pallas=up
                    )
                )
            )
            t0 = time.time()
            out = fn(dj, vj, dj2, vj)
            jax.block_until_ready(out)
            t_compile = time.time() - t0
            t0 = time.time()
            for _ in range(10):
                out = fn(dj, vj, dj2, vj)
            jax.block_until_ready(out)
            print(
                "B=%d pallas=%s: compile %.1fs, run %.2f ms/batch"
                % (B, up, t_compile, (time.time() - t0) / 10 * 1e3),
                flush=True,
            )


if __name__ == "__main__":
    main()

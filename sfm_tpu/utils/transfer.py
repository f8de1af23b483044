"""Chunked device<->host transfers — the single home for tunnel policy.

The TPU in this environment sits behind a network tunnel whose device->host
path degrades catastrophically above ~2 MB per transfer (measured: 1 MB in
0.27 s, 4 MB in 119 s). ``device_get_chunked`` slices big downloads into
<=1 MB pieces along axis 0 so they stay on the fast path. Host->device is
healthier but still chunk-sensitive: ~47 MB/s with 4 MB pieces vs 26 MB/s
for one large buffer (measured) — ``device_put_chunked`` uploads in ~4 MB
pieces. Prefer keeping bulk data device-resident entirely.
"""
from __future__ import annotations

import numpy as np
import jax

_CHUNK_BYTES = 1 << 20  # 1 MB


def device_get_chunked(x, chunk_bytes: int = _CHUNK_BYTES):
    """Fetch an array (or pytree) to host numpy, <=chunk_bytes per transfer."""
    leaves, treedef = jax.tree.flatten(x)
    out = []
    for leaf in leaves:
        if not hasattr(leaf, "nbytes") or leaf.nbytes <= chunk_bytes or leaf.ndim == 0:
            out.append(np.asarray(leaf))
            continue
        rows = max(1, int(chunk_bytes // max(leaf.nbytes // leaf.shape[0], 1)))
        parts = [
            np.asarray(leaf[i : i + rows]) for i in range(0, leaf.shape[0], rows)
        ]
        out.append(np.concatenate(parts, axis=0))
    return jax.tree.unflatten(treedef, out)


_PUT_CHUNK_BYTES = 4 << 20  # 4 MB: measured H2D sweet spot through the tunnel


def device_put_chunked(a, chunk_bytes: int = _PUT_CHUNK_BYTES):
    """Host array -> device, uploaded in ~chunk_bytes pieces along axis 0.

    Small arrays (<= 1.5x the chunk size) go up in one piece.
    """
    import jax.numpy as jnp

    if not hasattr(a, "nbytes") or a.nbytes <= 1.5 * chunk_bytes or a.ndim == 0:
        return jnp.asarray(a)
    per = max(1, int(chunk_bytes // max(a[0].nbytes, 1)))
    return jnp.concatenate(
        [jnp.asarray(a[i : i + per]) for i in range(0, len(a), per)]
    )

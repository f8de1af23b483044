"""TPU-friendly small-matrix linear algebra.

jnp.linalg.eigh/svd on tiny matrices lower to iterative Jacobi/QR loops that
dominate wall-clock when vmapped over 10^4-10^5 RANSAC hypotheses (measured:
the eigh(9x9)-based 8-point solver made the pair sweep 20x slower than the
OpenCV CPU baseline). The estimators instead use shifted inverse iteration —
one Cholesky factorization + k triangular solves — which is a handful of
fused mults per matrix and exact for the (near-)singular normal matrices
minimal solvers produce.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _adjugate3(A):
    """adj(A) for (..., 3, 3): transpose of the cofactor matrix, columns are
    cross products of A's rows."""
    c0 = jnp.cross(A[..., 1, :], A[..., 2, :])
    c1 = jnp.cross(A[..., 2, :], A[..., 0, :])
    c2 = jnp.cross(A[..., 0, :], A[..., 1, :])
    return jnp.stack([c0, c1, c2], axis=-1)  # stack as COLUMNS -> transpose


def _adjugate4(A):
    """adj(A) for (..., 4, 4) via 2x2-minor (Laplace) expansion — pure fused
    multiplies, no loops."""
    a = lambda i, j: A[..., i, j]
    s0 = a(0, 0) * a(1, 1) - a(1, 0) * a(0, 1)
    s1 = a(0, 0) * a(1, 2) - a(1, 0) * a(0, 2)
    s2 = a(0, 0) * a(1, 3) - a(1, 0) * a(0, 3)
    s3 = a(0, 1) * a(1, 2) - a(1, 1) * a(0, 2)
    s4 = a(0, 1) * a(1, 3) - a(1, 1) * a(0, 3)
    s5 = a(0, 2) * a(1, 3) - a(1, 2) * a(0, 3)
    c5 = a(2, 2) * a(3, 3) - a(3, 2) * a(2, 3)
    c4 = a(2, 1) * a(3, 3) - a(3, 1) * a(2, 3)
    c3 = a(2, 1) * a(3, 2) - a(3, 1) * a(2, 2)
    c2 = a(2, 0) * a(3, 3) - a(3, 0) * a(2, 3)
    c1 = a(2, 0) * a(3, 2) - a(3, 0) * a(2, 2)
    c0 = a(2, 0) * a(3, 1) - a(3, 0) * a(2, 1)
    rows = [
        [a(1, 1) * c5 - a(1, 2) * c4 + a(1, 3) * c3,
         -a(0, 1) * c5 + a(0, 2) * c4 - a(0, 3) * c3,
         a(3, 1) * s5 - a(3, 2) * s4 + a(3, 3) * s3,
         -a(2, 1) * s5 + a(2, 2) * s4 - a(2, 3) * s3],
        [-a(1, 0) * c5 + a(1, 2) * c2 - a(1, 3) * c1,
         a(0, 0) * c5 - a(0, 2) * c2 + a(0, 3) * c1,
         -a(3, 0) * s5 + a(3, 2) * s2 - a(3, 3) * s1,
         a(2, 0) * s5 - a(2, 2) * s2 + a(2, 3) * s1],
        [a(1, 0) * c4 - a(1, 1) * c2 + a(1, 3) * c0,
         -a(0, 0) * c4 + a(0, 1) * c2 - a(0, 3) * c0,
         a(3, 0) * s4 - a(3, 1) * s2 + a(3, 3) * s0,
         -a(2, 0) * s4 + a(2, 1) * s2 - a(2, 3) * s0],
        [-a(1, 0) * c3 + a(1, 1) * c1 - a(1, 2) * c0,
         a(0, 0) * c3 - a(0, 1) * c1 + a(0, 2) * c0,
         -a(3, 0) * s3 + a(3, 1) * s1 - a(3, 2) * s0,
         a(2, 0) * s3 - a(2, 1) * s1 + a(2, 2) * s0],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def _smallest_eigvec_adjugate(A, iters: int, shift: float):
    """Inverse iteration for n in {3, 4} with the explicit adjugate: x is
    repeatedly multiplied by adj(A + shift) ∝ (A + shift)^-1 and normalized —
    the det scale (and its sign) wash out in the normalization, so there is
    no division by a near-zero determinant and no factorization.

    Why not Cholesky: on TPU, cholesky/triangular_solve lower to while-loop
    programs whose (remote) compile cost dominated seed selection; for tiny n
    the adjugate is a handful of fused multiplies that compile instantly.
    """
    n = A.shape[-1]
    mean_eig = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None] / n
    eye = jnp.eye(n, dtype=A.dtype)
    M = _adjugate3(A + (shift * mean_eig + 1e-20) * eye) if n == 3 else _adjugate4(
        A + (shift * mean_eig + 1e-20) * eye
    )
    x = jnp.ones(A.shape[:-1], A.dtype) + 1e-3 * jnp.arange(n, dtype=A.dtype)
    for _ in range(iters):  # unrolled: keeps the program loop-free
        y = jnp.einsum("...ij,...j->...i", M, x)
        x = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-30)
    return x


def _chol_unrolled(A, eps: float = 1e-30):
    """Cholesky of (..., n, n) PD, fully unrolled (no while-loops in the
    lowered program). Returns (L rows as a list-of-lists of (...) scalars,
    bad flag: True where a pivot went nonpositive — i.e. A was not PD)."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    bad = jnp.zeros(A.shape[:-2], bool)
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        bad = bad | (s <= 0)
        d = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = d
        for i in range(j + 1, n):
            r = A[..., i, j]
            for k in range(j):
                r = r - L[i][k] * L[j][k]
            L[i][j] = r / d
    return L, bad


def _chol_solve_unrolled(L, x):
    """Solve L L^T z = x with unrolled forward/back substitution.
    x: (..., n) -> z: (..., n)."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = x[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    z = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * z[k]
        z[i] = s / L[i][i]
    return jnp.stack(z, axis=-1)


def _smallest_eigvec_unrolled(A, iters: int, shift: float, fallback_shift,
                              fallback: bool = True):
    """Inverse iteration with a fully-unrolled Cholesky — no lax loops.

    TPU: jnp.linalg.cholesky/triangular_solve lower to while-loop programs;
    vmapped over 10^4 RANSAC hypotheses they both run slower than the
    unrolled graph AND compile far slower through the remote-TPU path.
    Semantics match the loop-based path: small shift first, large-shift
    fallback where the small-shift factorization hit a nonpositive pivot.
    ``fallback=False`` skips the second factorization — right for RANSAC
    hypothesis solves, where a degenerate minimal sample may yield junk that
    simply scores zero consensus.
    """
    n = A.shape[-1]
    mean_eig = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None] / n
    eye = jnp.eye(n, dtype=A.dtype)
    L, bad = _chol_unrolled(A + (shift * mean_eig + 1e-20) * eye)
    if fallback:
        L2, _ = _chol_unrolled(A + (fallback_shift * mean_eig + 1e-20) * eye)
        pick = lambda a, b: jnp.where(bad, b, a)
        L = [[None if L[i][j] is None else pick(L[i][j], L2[i][j])
              for j in range(n)] for i in range(n)]
    x = jnp.ones(A.shape[:-1], A.dtype) + 1e-3 * jnp.arange(n, dtype=A.dtype)
    for _ in range(iters):
        y = _chol_solve_unrolled(L, x)
        x = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-30)
    return x


def smallest_eigvec(A, iters: int = 8, shift: float = 1e-6, fallback_shift: float = 1e-3,
                    fallback: bool = True):
    """Eigenvector of the smallest eigenvalue of a PSD matrix (..., n, n).

    Shifted inverse iteration: factor (A + shift*mean_eig*I) once (Cholesky),
    then run ``iters`` normalized solves. Two-tier shift: the small shift
    preserves f32 accuracy, but rounding can make the nominally-PSD normal
    matrix indefinite by ~1e-5 * scale and break the factorization — those
    batch entries fall back to the large shift (the fixed point is the same
    eigenvector either way; only the convergence rate and f32 conditioning
    differ). ``fallback=False`` (n in 5..16 only) skips the second
    factorization — use for RANSAC hypothesis solves where degenerate
    samples may score zero instead of being repaired.
    """
    A = jnp.asarray(A)
    n = A.shape[-1]
    if n <= 4:
        return _smallest_eigvec_adjugate(A, iters, shift)
    if n <= 16:
        return _smallest_eigvec_unrolled(A, iters, shift, fallback_shift, fallback)
    mean_eig = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None] / n
    eye = jnp.eye(n, dtype=A.dtype)
    L1 = jnp.linalg.cholesky(A + (shift * mean_eig + 1e-20) * eye)
    L2 = jnp.linalg.cholesky(A + (fallback_shift * mean_eig + 1e-20) * eye)
    ok = jnp.all(jnp.isfinite(L1), axis=(-2, -1), keepdims=True)
    L = jnp.where(ok, jnp.where(jnp.isfinite(L1), L1, 0.0), L2)

    # Fixed start vector (deterministic); ones is never orthogonal to the
    # null space in practice for normalized problem matrices — add a tiny
    # index ramp to break adversarial symmetry.
    x = jnp.ones(A.shape[:-1], A.dtype) + 1e-3 * jnp.arange(n, dtype=A.dtype)

    def body(x, _):
        y = jax.scipy.linalg.cho_solve((L, True), x[..., None])[..., 0]
        x = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-30)
        return x, None

    x, _ = jax.lax.scan(body, x, None, length=iters)
    return x

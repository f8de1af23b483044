"""Global SfM initialization: rotation + translation averaging on the MXU.

A capability the reference does not have (its only initialization is the
two-view seed + one-at-a-time incremental growth, ref
sfm_reconstruction.py:61-155, :633-709): solve for ALL camera poses at once
from the verified pair graph, then triangulate everything and polish with
global bundle adjustment. On well-connected scenes this replaces O(N)
sequential register->BA rounds (each a host-driven device dispatch) with a
handful of batched device programs, and it is immune to the drift/ordering
sensitivity of incremental growth.

TPU-first design notes:
- every stage is a fixed-shape batched program: relative poses for all P
  accepted pairs in one vmapped dispatch; rotation averaging as power
  iteration on a (3N, 3N) block matrix (pure matmuls on the MXU); the
  Lie-algebra refinement and translation averaging as graph-Laplacian CG
  solves with unrolled, loop-free iterations (remote-TPU tunnel: lowered
  while-loops are compile bombs, see utils/linalg.py).
- no SVD / eigh anywhere: proper-rotation projection is the Davenport
  quaternion method driven by unrolled power iteration (4x4), and the
  spectral basis comes from plain power iteration + closed-form 3-column
  Gram-Schmidt.

References: Martinec & Pajdla CVPR'07 (spectral rotation averaging),
Chatterjee & Govindu ICCV'13 (Lie-algebraic refinement), Govindu CVPR'04
(translation registration); implementation is original and loop-free.
"""
from __future__ import annotations

import logging

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as Pspec

from sfm_tpu.geometry.epipolar import eight_point, recover_pose
from sfm_tpu.geometry.rotations import rodrigues, rotation_to_rvec
from sfm_tpu.utils.linalg import _chol_unrolled, _chol_solve_unrolled
from sfm_tpu.utils.precision import f32_matmuls

logger = logging.getLogger(__name__)

_EPS = 1e-12


def _skew3(v):
    zero = jnp.zeros((), v.dtype)
    return jnp.array(
        [[zero, -v[2], v[1]], [v[2], zero, -v[0]], [-v[1], v[0], zero]]
    )


def _solve6(H, g):
    """SPD 6x6 solve via the fully-unrolled Cholesky (utils.linalg) — the
    lowered LU of jnp.linalg.solve is a while-loop program the remote-TPU
    tunnel compiles pathologically slowly."""
    L, _bad = _chol_unrolled(H)
    return _chol_solve_unrolled(L, g)


# --------------------------------------------------------------------------
# Relative poses for all accepted pairs (one vmapped program)
# --------------------------------------------------------------------------


def pairwise_relative_poses(table, K, min_inliers: int = 15,
                            refine_gn_iters: int = 10,
                            max_matches: int = 256, mesh=None):
    """Relative (R_ij, t_ij) for every accepted pair with enough inliers.

    Per pair: re-estimate E by the weighted 8-point solve on the pair's
    inlier matches in NORMALIZED camera coordinates (markedly more accurate
    than E = K^T F K of the stored pixel-space F — measured on the bunny
    artifacts: rel-rotation median 19.5 -> 8.9 deg), cheirality-disambiguate
    (recover_pose, the cv2.recoverPose equivalent used at ref
    sfm_reconstruction.py:85-88), then polish (R, t) with ``refine_gn_iters``
    Gauss-Newton steps on the Sampson error of E = [t]x R (t-direction
    median 21 -> 5 deg on the same data). One vmapped jitted program over
    all pairs; the GN loop is python-unrolled (no lowered while-loop — the
    remote-TPU tunnel compiles those pathologically).

    Convention: x_j = R_ij x_i + t_ij with |t_ij| = 1.

    ``max_matches`` bounds the inlier subsample per pair (a 5-dof problem
    saturates well below the padded budget); ``mesh`` shards the pair axis
    of every chunk over the device mesh — the per-pair GN is embarrassingly
    parallel, so GSPMD splits the vmap with zero collectives (round-3
    verdict next #3: this stage was the 512-camera global init's dominant
    cost at 69 s on one chip).

    Returns dict of host arrays: ``pairs`` (P, 2) int32, ``R`` (P, 3, 3),
    ``t`` (P, 3), ``weight`` (P,) float32 (inlier count).
    """
    rows = np.nonzero(table.accept & (table.num_inliers >= min_inliers))[0]
    # Pairless-image rescues may sit below min_inliers: keep each such
    # image's BEST accepted pair regardless, so averaging covers every
    # connected camera. Vectorized (no per-pair python loop / np.append).
    n_nodes = int(table.pairs.max(initial=0)) + 1
    deg = np.bincount(table.pairs[rows].ravel(), minlength=n_nodes)
    acc = np.nonzero(table.accept)[0]
    extra = []
    for img in np.nonzero(deg == 0)[0]:
        cand = acc[(table.pairs[acc] == img).any(axis=1)]
        if len(cand):
            extra.append(cand[np.argmax(table.num_inliers[cand])])
    if extra:
        rows = np.unique(np.concatenate([rows, np.asarray(extra)]))
    if len(rows) == 0:
        raise ValueError("no accepted pairs to average over")

    K = np.asarray(K, np.float32)
    f = np.array([K[0, 0], K[1, 1]], np.float32)
    c = np.array([K[0, 2], K[1, 2]], np.float32)
    inl = table.inliers[rows] & table.match_valid[rows]
    xy1 = table.xy1[rows]
    xy2 = table.xy2[rows]
    # A 5-dof relative pose needs nowhere near the full padded match budget:
    # keep the first ``max_matches`` INLIER slots per pair (stable argsort
    # moves inliers to the front, preserving match-quality order). At 512
    # cams / 104k accepted pairs the cut from 1024 to 256 shrank the
    # averaging stage's dominant cost 4x.
    S = max_matches
    if xy1.shape[1] > S:
        order = np.argsort(~inl, axis=1, kind="stable")[:, :S]
        ridx = np.arange(len(rows))[:, None]
        xy1 = xy1[ridx, order]
        xy2 = xy2[ridx, order]
        inl = inl[ridx, order]
    xn1 = jnp.asarray((xy1 - c) / f)
    xn2 = jnp.asarray((xy2 - c) / f)
    w = jnp.asarray(inl, jnp.float32)
    eye3 = jnp.eye(3, dtype=jnp.float32)

    def _sampson(params, x1, x2, wts):
        rv, t = params[:3], params[3:]
        E = _skew3(t) @ rodrigues(rv)
        x1h = jnp.concatenate([x1, jnp.ones((x1.shape[0], 1))], 1)
        x2h = jnp.concatenate([x2, jnp.ones((x2.shape[0], 1))], 1)
        Ex1 = x1h @ E.T
        Etx2 = x2h @ E
        num = jnp.sum(x2h * Ex1, 1)
        den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
        return wts * num / jnp.sqrt(jnp.maximum(den, 1e-12))

    @f32_matmuls
    def _all_impl(xn1, xn2, w):
        def one(x1, x2, w1):
            E = eight_point(x1, x2, weights=w1)
            n, R, t, mask = recover_pose(E, x1, x2, eye3, weights=w1)
            params = jnp.concatenate([rotation_to_rvec(R), t])
            wr = w1 * mask
            for _ in range(refine_gn_iters):
                J = jax.jacfwd(_sampson)(params, x1, x2, wr)
                r = _sampson(params, x1, x2, wr)
                H = J.T @ J
                # Gauge: E is invariant to |t| — block that null direction,
                # ridge relative to H's own scale, clip the step (GN on a
                # nonconvex residual needs the trust region).
                tdir = jnp.concatenate([jnp.zeros(3), params[3:]])
                H = H + jnp.outer(tdir, tdir) + (
                    1e-4 * jnp.trace(H) / 6 + 1e-12) * jnp.eye(6)
                step = _solve6(H, J.T @ r)
                step = step * jnp.minimum(
                    1.0, 0.5 / jnp.maximum(jnp.linalg.norm(step), 1e-12))
                params = params - step
                params = params.at[3:].set(
                    params[3:] / jnp.maximum(jnp.linalg.norm(params[3:]), 1e-9))
            # Re-resolve the (R, t) sign ambiguity of the refined E by
            # cheirality (GN can wander to the twisted pair).
            E2 = _skew3(params[3:]) @ rodrigues(params[:3])
            n2, R2, t2, _ = recover_pose(E2, x1, x2, eye3, weights=w1)
            return R2, t2, n2

        return jax.vmap(one)(xn1, xn2, w)

    # Chunk the pair axis: at M=1024 matches the GN Jacobian alone is
    # (M, 6) floats per pair — one program over 100k+ pairs would blow HBM.
    # Fixed chunk size = one compile, many launches (the sweep's pattern).
    # With a mesh, each chunk's pair axis is sharded across it (GSPMD splits
    # the vmap; the per-pair program has no cross-pair dependence).
    if mesh is not None:
        axis = mesh.axis_names[0]
        shard = NamedSharding(mesh, Pspec(axis))
        repl = NamedSharding(mesh, Pspec())
        _all = jax.jit(_all_impl, in_shardings=(shard, shard, shard),
                       out_shardings=repl)
        n_dev = mesh.devices.size
    else:
        _all = jax.jit(_all_impl)
        n_dev = 1
    P_rows = xn1.shape[0]
    chunk = 2048
    if P_rows <= chunk and P_rows % n_dev == 0:
        R, t, n_good = _all(xn1, xn2, w)
    else:
        pad = (-P_rows) % chunk
        if pad:
            xn1 = jnp.concatenate([xn1, jnp.repeat(xn1[-1:], pad, 0)])
            xn2 = jnp.concatenate([xn2, jnp.repeat(xn2[-1:], pad, 0)])
            w = jnp.concatenate([w, jnp.repeat(w[-1:], pad, 0)])
        outs = [
            _all(xn1[c:c + chunk], xn2[c:c + chunk], w[c:c + chunk])
            for c in range(0, P_rows + pad, chunk)
        ]
        R = jnp.concatenate([o[0] for o in outs])[:P_rows]
        t = jnp.concatenate([o[1] for o in outs])[:P_rows]
        n_good = jnp.concatenate([o[2] for o in outs])[:P_rows]
    return {
        "pairs": table.pairs[rows].astype(np.int32),
        "R": np.asarray(R),
        "t": np.asarray(t),
        "weight": np.asarray(table.num_inliers[rows], np.float32),
        "cheirality_good": np.asarray(n_good),
    }


# --------------------------------------------------------------------------
# Proper-rotation projection (Davenport quaternion, no SVD)
# --------------------------------------------------------------------------


def nearest_rotation(A):
    """Nearest det=+1 rotation to (..., 3, 3) via the Davenport q-method.

    The maximizing quaternion of q^T B(A) q (B the symmetric 4x4 Davenport
    matrix) gives the closest proper rotation in Frobenius norm — unlike the
    orthogonal polar factor, this lands in SO(3) even when det(A) < 0.
    Power iteration on B + c I (unrolled, no eigh).
    """
    A = jnp.asarray(A)
    # B rows/cols ordered (w, x, y, z).
    a11, a12, a13 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a21, a22, a23 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a31, a32, a33 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    B = jnp.stack(
        [
            jnp.stack([a11 + a22 + a33, a32 - a23, a13 - a31, a21 - a12], -1),
            jnp.stack([a32 - a23, a11 - a22 - a33, a12 + a21, a13 + a31], -1),
            jnp.stack([a13 - a31, a12 + a21, a22 - a11 - a33, a23 + a32], -1),
            jnp.stack([a21 - a12, a13 + a31, a23 + a32, a33 - a11 - a22], -1),
        ],
        -2,
    )
    # Shift so the target (largest) eigenvalue dominates in magnitude.
    c = jnp.linalg.norm(A, axis=(-2, -1), keepdims=True) * 2.0 + 1e-6
    Bs = B + c * jnp.eye(4, dtype=A.dtype)

    # Start vector: one-hot at the largest DIAGONAL of the Davenport matrix
    # (Shepperd's branch rule). A fixed start like ones(4) fails whenever
    # the target quaternion is orthogonal to it (measured: a 180-degree
    # rotation about (1,-1,0)/sqrt(2) has quaternion (0,.7,-.7,0) ⊥ ones —
    # power iteration converged to the SECOND eigenvector, 180 degrees from
    # the optimum). The argmax-diagonal component of the top eigenvector is
    # bounded away from zero for (near-)rotations, and the start stays
    # deterministic and single-branch — no per-block candidate selection
    # that could pick inconsistently across the shared-gauge blocks of the
    # spectral init.
    diag = jnp.diagonal(B, axis1=-2, axis2=-1)
    q = jax.nn.one_hot(jnp.argmax(diag, axis=-1), 4, dtype=A.dtype)
    for _ in range(24):
        q = jnp.einsum("...ij,...j->...i", Bs, q)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def _log_so3(R):
    """Rotation log (..., 3, 3) -> (..., 3), branchless small/large-angle."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    sin_t = jnp.maximum(jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0)), _EPS)
    # theta/(2 sin theta), series-safe at 0; near pi the skew part vanishes
    # but averaging residuals there are outlier-sized anyway and Huber-capped.
    scale = jnp.where(theta < 1e-4, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_t))
    return v * scale[..., None]


# --------------------------------------------------------------------------
# Rotation averaging
# --------------------------------------------------------------------------


def _gram_schmidt3(X):
    """Orthonormalize the 3 columns of (M, 3), closed form."""
    c0 = X[:, 0] / jnp.maximum(jnp.linalg.norm(X[:, 0]), _EPS)
    c1 = X[:, 1] - (c0 @ X[:, 1]) * c0
    c1 = c1 / jnp.maximum(jnp.linalg.norm(c1), _EPS)
    c2 = X[:, 2] - (c0 @ X[:, 2]) * c0 - (c1 @ X[:, 2]) * c1
    c2 = c2 / jnp.maximum(jnp.linalg.norm(c2), _EPS)
    return jnp.stack([c0, c1, c2], axis=1)


def spanning_forest(pairs, weights, num_images):
    """Max-weight spanning forest of the pair graph, as BFS edge sequences.

    Returns (child, parent, edge, flip) int/bool arrays ordered so every
    parent appears (as a child or root) before its children — composing
    per-edge quantities in this order initializes each node from an
    already-initialized parent. ``flip`` marks edges stored as
    (child, parent), i.e. the relative measurement must be inverted.
    Host/scipy: milliseconds even at 500k edges.
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import breadth_first_order, minimum_spanning_tree

    pairs = np.asarray(pairs)
    w = np.asarray(weights, np.float64)
    N = num_images
    i_idx, j_idx = pairs[:, 0], pairs[:, 1]
    # Dedup parallel edges keeping the best weight (coo->csr would SUM them).
    key = np.minimum(i_idx, j_idx).astype(np.int64) * N + np.maximum(i_idx, j_idx)
    order = np.lexsort((w, key))
    last = np.r_[key[order][1:] != key[order][:-1], True]
    keep = order[last]                       # best-weight edge per (i, j)
    eid = sp.csr_matrix(
        (keep + 1, (i_idx[keep], j_idx[keep])), shape=(N, N))  # 1-based ids
    # Max-weight forest == min spanning tree on negated weights. Shift below
    # zero so csgraph never confuses a real weight with "no edge" (0).
    g = sp.csr_matrix((-(w[keep] + 1.0), (i_idx[keep], j_idx[keep])),
                      shape=(N, N))
    T = minimum_spanning_tree(g + g.T)
    T = (T + T.T).tocsr()

    child, parent = [], []
    seen = np.zeros(N, bool)
    deg = np.diff(T.indptr)
    for root in np.nonzero(deg > 0)[0]:
        if seen[root]:
            continue
        nodes, preds = breadth_first_order(
            T, int(root), directed=False, return_predecessors=True)
        seen[nodes] = True
        child.append(nodes[1:])              # BFS order: parents first
        parent.append(preds[nodes[1:]])
    if not child:
        z = np.zeros(0, np.int32)
        return z, z, z, np.zeros(0, bool)
    child = np.concatenate(child).astype(np.int32)
    parent = np.concatenate(parent).astype(np.int32)
    e_fwd = np.asarray(eid[parent, child]).ravel()   # stored (parent, child)?
    e_rev = np.asarray(eid[child, parent]).ravel()
    flip = e_fwd == 0                        # stored as (child, parent)
    edge = np.where(flip, e_rev, e_fwd).astype(np.int64) - 1
    return child, parent, edge, flip


def tree_init_rotations(forest, R_rel, num_images):
    """Compose absolute rotations along a spanning forest (R_j = R_ij R_i).

    On long weakly-connected graphs (ordered corridors: diameter ~N/window)
    the spectral power iteration and Laplacian CG propagate information only
    one graph-hop per matmul, so no fixed iteration budget can converge the
    gauge across the chain; composing along the max-weight tree is exact up
    to the per-edge noise random walk and puts the iterative stages in their
    locally-convergent regime.
    """
    child, parent, edge, flip = forest
    R_rel = np.asarray(R_rel, np.float64)
    R0 = np.tile(np.eye(3), (num_images, 1, 1))
    for c, p, e, f in zip(child, parent, edge, flip):
        Rij = R_rel[e]
        R0[c] = (Rij.T if f else Rij) @ R0[p]
    return R0.astype(np.float32)


def tree_init_centers(forest, R_abs, pairs, t_rel, num_images):
    """Compose camera centers along the forest with unit per-edge baselines.

    Only the baseline DIRECTION d = unit(-R_j^T t_ij) is measured; unit
    lengths give the right topology (the ridge CG then resolves relative
    scales locally, which it does well — it is the global gauge it cannot
    propagate from a zero start on a chain).
    """
    child, parent, edge, flip = forest
    pairs = np.asarray(pairs)
    R_abs = np.asarray(R_abs, np.float64)
    t_rel = np.asarray(t_rel, np.float64)
    j = pairs[:, 1]
    d_all = -np.einsum("pba,pb->pa", R_abs[j], t_rel)   # C_j - C_i direction
    d_all /= np.maximum(np.linalg.norm(d_all, axis=-1, keepdims=True), 1e-12)
    C0 = np.zeros((num_images, 3))
    for c, p, e, f in zip(child, parent, edge, flip):
        C0[c] = C0[p] - d_all[e] if f else C0[p] + d_all[e]
    return C0.astype(np.float32)


def rotation_averaging(
    pairs, R_rel, weights, num_images, power_iters: int = 48,
    refine_iters: int = 10, init=None,
):
    """Absolute rotations (N, 3, 3) from pairwise R_ij (x_j = R_ij x_i ...).

    Spectral initialization (power iteration on the weighted block matrix
    G_ij = R_ij^T for i<j — its top-3 eigenspace stacks the absolute
    rotations up to one global gauge) followed by ``refine_iters`` rounds of
    Lie-algebra IRLS: linearize R_j ~ exp(d_j) R_j around the estimate, solve
    the weighted graph Laplacian for the per-camera tangent updates with
    Huber-downweighted residuals (robustness the spectral step lacks).
    Cameras not touched by any pair get the identity.

    ``init``: optional (N, 3, 3) starting rotations (spanning-tree
    composition, :func:`tree_init_rotations`) seeding the power iteration —
    required for convergence on large-diameter graphs (see that docstring).

    Everything is one jitted loop-free program: the (3N, 3N) x (3N, 3)
    power-iteration matmuls and the (N, N) Laplacian CG run on the MXU.
    """
    P = pairs.shape[0]
    N = num_images
    i_idx = jnp.asarray(pairs[:, 0], jnp.int32)
    j_idx = jnp.asarray(pairs[:, 1], jnp.int32)
    Rr = jnp.asarray(R_rel, jnp.float32)
    w = jnp.asarray(weights, jnp.float32)
    w = w / jnp.maximum(jnp.mean(w), _EPS)
    X0 = jnp.asarray(
        np.tile(np.eye(3, dtype=np.float32), (N, 1)) if init is None
        else np.asarray(init, np.float32).reshape(3 * N, 3))

    @jax.jit
    @f32_matmuls
    def _solve(i_idx, j_idx, Rr, w, X):
        # ---- spectral init -------------------------------------------------
        # G[3i:3i+3, 3j:3j+3] = w R_ij^T (and transpose block at (j, i)):
        # for Z stacking Z_i = R_i, G_ij Z_j = R_ij^T R_j = R_i.
        rows3 = (3 * i_idx[:, None, None] + jnp.arange(3)[None, :, None])
        cols3 = (3 * j_idx[:, None, None] + jnp.arange(3)[None, None, :])
        G = jnp.zeros((3 * N, 3 * N), jnp.float32)
        Rt_w = jnp.swapaxes(Rr, -1, -2) * w[:, None, None]
        G = G.at[rows3, cols3].add(Rt_w)
        G = G.at[jnp.swapaxes(cols3, -1, -2), jnp.swapaxes(rows3, -1, -2)].add(
            jnp.swapaxes(Rt_w, -1, -2)
        )
        # Degree-normalize (random-walk) + identity: keeps untouched cameras
        # stable and the iteration well conditioned.
        deg = jnp.zeros((N,), jnp.float32)
        deg = deg.at[i_idx].add(w).at[j_idx].add(w)
        dinv = 1.0 / jnp.maximum(deg, 1.0)
        Gn = G * jnp.repeat(dinv, 3)[:, None]

        for _ in range(power_iters):
            X = Gn @ X + X  # (I + D^-1 G): shifts the spectrum positive
            X = _gram_schmidt3(X)
        blocks = X.reshape(N, 3, 3)
        # Shared gauge: align so camera blocks are near rotations, then
        # project each to SO(3). det sign is global (shared mixing matrix);
        # nearest_rotation lands in SO(3) either way.
        R0 = nearest_rotation(blocks)  # (N, 3, 3)

        # ---- Lie-algebra IRLS refinement ----------------------------------
        def refine(R_abs, delta):
            # Residual rotation per pair: E_ij = R_j^T R_ij R_i. With the
            # right-multiplicative update R <- R exp(delta),
            #   E'_ij = exp(-delta_j) E_ij exp(delta_i),
            # so to first order r' = r - delta_j + delta_i where r = log E_ij:
            # solve the graph-Laplacian LSQ for delta with delta_j - delta_i
            # = r (Huber-downweighted), then apply on the right.
            Ri = R_abs[i_idx]
            Rj = R_abs[j_idx]
            Eij = jnp.einsum("pba,pbc,pcd->pad", Rj, Rr, Ri)  # R_j^T R_ij R_i
            r = _log_so3(Eij)  # (P, 3)
            rn = jnp.linalg.norm(r, axis=-1)
            huber = jnp.where(rn > delta, delta / jnp.maximum(rn, _EPS), 1.0)
            wp = w * huber
            L = jnp.zeros((N, N), jnp.float32)
            L = L.at[i_idx, j_idx].add(-wp).at[j_idx, i_idx].add(-wp)
            L = L.at[i_idx, i_idx].add(wp).at[j_idx, j_idx].add(wp)
            L = L + 1e-6 * jnp.eye(N, dtype=jnp.float32)
            b = jnp.zeros((N, 3), jnp.float32)
            b = b.at[j_idx].add(wp[:, None] * r).at[i_idx].add(-wp[:, None] * r)
            d = _cg(L, b, iters=32)
            # exp(delta) via second-order series projected back to SO(3).
            dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
            zeros = jnp.zeros_like(dx)
            S = jnp.stack(
                [
                    jnp.stack([zeros, -dz, dy], -1),
                    jnp.stack([dz, zeros, -dx], -1),
                    jnp.stack([-dy, dx, zeros], -1),
                ],
                -2,
            )
            dR = nearest_rotation(jnp.eye(3) + S + 0.5 * (S @ S))
            return R_abs @ dR

        # Annealed Huber: the first rounds keep a wide basin (the spectral
        # init can be far off when the graph carries outlier pairs — small
        # graphs give them real spectral weight), the later rounds shrink
        # the scale so outliers are effectively excised.
        for k in range(refine_iters):
            delta = max(0.3 * (0.6 ** k), 0.02)
            R0 = refine(R0, delta)
        return R0

    return np.asarray(_solve(i_idx, j_idx, Rr, w, X0))


def _cg(A, b, iters: int, x0=None):
    """Unrolled conjugate gradient for SPD (N, N) against (N, k) RHS.

    Loop-free (python-unrolled): each step is one (N, N) @ (N, k) matvec +
    scalar recurrences — fused by XLA, no lowered while-loop (tunnel rule).
    ``x0`` warm-starts the iteration (residual-space CG).
    """
    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0
        r = b - A @ x0
    p = r
    rs = jnp.sum(r * r)
    for _ in range(iters):
        Ap = A @ p
        alpha = rs / jnp.maximum(jnp.sum(p * Ap), _EPS)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r)
        p = r + (rs_new / jnp.maximum(rs, _EPS)) * p
        rs = rs_new
    return x


# --------------------------------------------------------------------------
# Translation averaging
# --------------------------------------------------------------------------


def translation_averaging(
    pairs, R_abs, t_rel, weights, num_images,
    als_rounds: int = 3, cg_iters: int = 80, init=None,
):
    """Camera centers (N, 3) from pairwise baseline directions.

    With x_j = R_ij x_i + t_ij and centers C: C_j - C_i = -R_j^T t_ij, i.e.
    each pair fixes the *direction* (and sign) of the world baseline
    d_p = unit(-R_j^T t_ij). Minimizing the projection residual

        E(C) = sum_p w_p | (I - d_p d_p^T)(C_j - C_i) |^2  =  C^T M C

    has the true embedding C* in (or near) M's null space, alongside the
    trivial collapse C = const. Instead of an eigensolve we exploit the
    measured SIGNS: with q defined by q^T C = sum_p w_p d_p . (C_j - C_i)
    (positive at C*, zero at any collapse), the ridge solve

        (M + eps I) C = q

    concentrates on the near-null direction with the correct orientation —
    one unrolled-CG solve on the MXU, no eigensolver, no slow alternation.
    ``als_rounds`` are IRLS reweighting rounds (Huber on the per-pair
    angular residual) that contain outlier directions. Scale gauge is set
    afterwards: median measured baseline = 1 (matches the incremental
    path's |t| = 1 seed convention). Cameras in no pair sit at the origin
    (they are re-localized later by guided PnP).

    ``init``: optional (N, 3) starting centers (spanning-tree composition,
    :func:`tree_init_centers`). With an init the solver switches from the
    ridge-sign solve to scale-explicit ALS: estimate per-edge baseline
    lengths s_p = <C_j - C_i, d_p> from the current embedding, then solve
    the well-posed weighted Laplacian LSQ  sum_p w_p |C_j - C_i - s_p d_p|^2
    with CG warm-started at the current C. The ridge-sign solve is kept for
    init=None but is structurally blind on large-diameter graphs: its sign
    functional q_k = sum_in d - sum_out d CANCELS at interior chain nodes
    (measured on a 240-node corridor chain: median center error ~ the full
    scene extent), while the ALS residual around a tree init is local and
    converges regardless of diameter.
    """
    N = num_images
    i_idx = jnp.asarray(pairs[:, 0], jnp.int32)
    j_idx = jnp.asarray(pairs[:, 1], jnp.int32)
    w = jnp.asarray(weights, jnp.float32)
    w = w / jnp.maximum(jnp.mean(w), _EPS)
    Rj = jnp.asarray(R_abs, jnp.float32)[j_idx]
    d = -jnp.einsum("pba,pb->pa", Rj, jnp.asarray(t_rel, jnp.float32))
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), _EPS)
    C_init = jnp.asarray(
        np.zeros((N, 3), np.float32) if init is None
        else np.asarray(init, np.float32))

    @jax.jit
    @f32_matmuls
    def _solve(i_idx, j_idx, d, w, C):
        eye3 = jnp.eye(3, dtype=jnp.float32)
        Proj = eye3[None] - d[:, :, None] * d[:, None, :]  # (P, 3, 3)
        rows3 = 3 * i_idx[:, None, None] + jnp.arange(3)[None, :, None]
        cols3 = 3 * j_idx[:, None, None] + jnp.arange(3)[None, None, :]
        rows_t = jnp.swapaxes(rows3, -1, -2)
        cols_t = jnp.swapaxes(cols3, -1, -2)

        def assemble(wp):
            B = wp[:, None, None] * Proj
            M = jnp.zeros((3 * N, 3 * N), jnp.float32)
            M = M.at[rows3, rows_t].add(B).at[cols_t, cols3].add(B)
            M = M.at[rows3, cols3].add(-B).at[cols_t, rows_t].add(-B)
            q = jnp.zeros((N, 3), jnp.float32)
            q = q.at[j_idx].add(wp[:, None] * d).at[i_idx].add(-wp[:, None] * d)
            return M, q.reshape(-1)

        def residual_weights(C):
            base = C[j_idx] - C[i_idx]
            bn = jnp.maximum(jnp.linalg.norm(base, axis=-1), _EPS)
            proj = jnp.einsum("pa,pa->p", base, d)
            sin_res = jnp.linalg.norm(base - proj[:, None] * d, axis=-1) / bn
            wp = w * jnp.where(sin_res > 0.05, 0.05 / sin_res, 1.0)
            # The perpendicular residual is sign-blind: a pair whose
            # direction landed on the flipped (twisted-pair) sign fits
            # sin_res ~ 0 with d = -true. The projection onto the
            # CURRENT embedding exposes it — negative projection means
            # the measured sign disagrees with the consensus layout.
            wp = jnp.where(proj < 0, wp * 1e-2, wp)
            return wp, proj

        # Ridge-sign solve: robust on well-connected graphs (no init needed).
        C_r = C * 0.0
        wp = w
        for k in range(max(als_rounds, 1)):
            if k > 0:
                wp, _ = residual_weights(C_r)
            M, q = assemble(wp)
            eps = 1e-3 * jnp.trace(M) / (3 * N) + 1e-8
            x = _cg(M + eps * jnp.eye(3 * N, dtype=jnp.float32),
                    q[:, None], iters=cg_iters)[:, 0]
            C_r = x.reshape(N, 3)
            C_r = C_r - jnp.mean(C_r, axis=0, keepdims=True)
        if init is None:
            return C_r

        # Tree init available: pick the better of (ridge, tree) under the
        # sign-aware direction residual, then ALS-refine from the winner.
        # The ridge solve wins on well-connected graphs (the tree's unit
        # baselines distort heterogeneous-scale scenes and ALS alone can
        # stall in that distorted basin); the tree wins on chains, where the
        # ridge's sign functional cancels (see docstring).
        def score(Ce):
            base = Ce[j_idx] - Ce[i_idx]
            bn = jnp.maximum(jnp.linalg.norm(base, axis=-1), _EPS)
            cos = jnp.einsum("pa,pa->p", base, d) / bn
            return jnp.sum(w * (1.0 - cos)) / jnp.maximum(jnp.sum(w), _EPS)

        C = jnp.where(score(C_r) <= score(C), C_r, C)
        # Scale-explicit ALS around the winner (see docstring).
        for k in range(max(als_rounds, 1)):
            wp, proj = residual_weights(C)
            # Per-edge baseline length from the current embedding; flipped
            # signs contribute |proj| at 1e-2 weight, zeros floored so no
            # target degenerates to a point constraint.
            scale_floor = 0.05 * jnp.mean(jnp.abs(proj))
            s_p = jnp.maximum(jnp.abs(proj), scale_floor)
            target = s_p[:, None] * d                     # (P, 3)
            L = jnp.zeros((N, N), jnp.float32)
            L = L.at[i_idx, j_idx].add(-wp).at[j_idx, i_idx].add(-wp)
            L = L.at[i_idx, i_idx].add(wp).at[j_idx, j_idx].add(wp)
            L = L + 1e-6 * jnp.eye(N, dtype=jnp.float32)
            b = jnp.zeros((N, 3), jnp.float32)
            b = b.at[j_idx].add(wp[:, None] * target)
            b = b.at[i_idx].add(-wp[:, None] * target)
            C = _cg(L, b, iters=cg_iters, x0=C)
            C = C - jnp.mean(C, axis=0, keepdims=True)
        return C

    C = np.asarray(_solve(i_idx, j_idx, d, w, C_init))
    # Scale gauge: median baseline length = 1 (host-side — jnp.median lowers
    # to a sort, a known compile bomb through the remote-TPU tunnel).
    base = np.linalg.norm(C[np.asarray(j_idx)] - C[np.asarray(i_idx)], axis=-1)
    med = float(np.median(base)) if len(base) else 1.0
    return C / max(med, 1e-12)


def cycle_consistency_weights(pairs, R_rel, sigma_deg: float = 15.0,
                              max_triangles: int = 8, floor: float = 1e-3):
    """Per-edge soft weight from rotation cycle consistency (Zach CVPR'10
    idea, soft variant): an edge whose measured R_ij disagrees with the
    compositions through common neighbors is downweighted by
    exp(-(median_cycle_angle / sigma)^2), floored (never zeroed — hard
    removal can disconnect the graph and with it the averaging gauge).

    Host-side numpy: runs once per scene over P edges x <= max_triangles
    sampled triangles; identifies the reference-artifact graph's
    false-consensus pairs (verified on bunny: kept edges' median GT error
    2.8 deg vs dropped edges' 16-30 deg).
    """
    import scipy.sparse as sp

    pairs = np.asarray(pairs)
    R_rel = np.asarray(R_rel)
    P = len(pairs)
    N = int(pairs.max()) + 1
    i_idx, j_idx = pairs[:, 0], pairs[:, 1]

    # Fully vectorized triangle sampling (the per-edge Python loop was 17 s
    # at 104k edges; computing exact common-neighbor sets via a sparse
    # row product was another 6 s): take the first few neighbors of i and
    # test (k, j) adjacency against a dense edge-id table. Sampling, not
    # exhaustive — which is what max_triangles asks for anyway.
    A = sp.csr_matrix(
        (np.ones(2 * P, np.int8),
         (np.concatenate([i_idx, j_idx]), np.concatenate([j_idx, i_idx]))),
        shape=(N, N),
    ).tocsr()
    eid = np.full((N, N), -1, np.int32)
    eid[i_idx, j_idx] = np.arange(P)
    eid[j_idx, i_idx] = np.arange(P)

    C0 = 3 * max_triangles  # candidate neighbors of i to probe per edge
    deg = np.diff(A.indptr)
    starts = A.indptr[i_idx]
    offs = np.arange(C0)
    cand = A.indices[np.minimum(starts[:, None] + offs[None, :],
                                A.nnz - 1)]          # (P, C0) neighbor ids
    cand_ok = (offs[None, :] < deg[i_idx][:, None]) & (eid[cand, j_idx[:, None]] >= 0)
    # keep the first max_triangles hits per row
    rank = np.cumsum(cand_ok, axis=1)
    cand_ok &= rank <= max_triangles
    tri_edge, col = np.nonzero(cand_ok)
    tri_k = cand[tri_edge, col]
    tri_i = i_idx[tri_edge]
    tri_j = j_idx[tri_edge]

    def rot(a, b):
        # Rotation of edge (a, b) in the a->b orientation; R_rel[p] maps
        # pairs[p,0] -> pairs[p,1], so the reverse orientation transposes.
        p = eid[a, b]
        R = R_rel[p]
        flip = (pairs[p, 0] != a)
        return np.where(flip[:, None, None], np.swapaxes(R, -1, -2), R)

    # Cycle i -> j (measured R_ij) -> j -> k -> i: identity if consistent.
    C = np.einsum("tab,tbc,tcd->tad", rot(tri_k, tri_i), rot(tri_j, tri_k),
                  R_rel[tri_edge])
    tr = np.clip((np.trace(C, axis1=-2, axis2=-1) - 1.0) * 0.5, -1.0, 1.0)
    tri_ang = np.degrees(np.arccos(tr)).astype(np.float32)

    # Per-edge median, vectorized: scatter into a (P, max_triangles) table
    # padded with +inf, sort rows (inf sorts last), pick the two middle
    # elements of the valid prefix. (np.nanmedian is an order of magnitude
    # slower than a sort at this shape.)
    counts = np.bincount(tri_edge, minlength=P)
    ang_tab = np.full((P, max(max_triangles, 1)), np.inf, np.float32)
    slot = rank[tri_edge, col] - 1
    ang_tab[tri_edge, slot] = tri_ang
    ang_tab.sort(axis=1)
    c = np.maximum(counts, 1)
    lo = ang_tab[np.arange(P), (c - 1) // 2]
    hi = ang_tab[np.arange(P), c // 2]
    ang = np.where(counts > 0, 0.5 * (lo + hi), 90.0).astype(np.float32)
    return np.maximum(np.exp(-((ang / sigma_deg) ** 2)), floor).astype(np.float32)


# --------------------------------------------------------------------------
# Top-level: poses for the whole scene
# --------------------------------------------------------------------------


def _averaging_weights(rel, cfg):
    """Per-edge averaging weights: inlier count x cheirality evidence x
    cycle consistency (shared by :func:`global_poses` and
    :func:`polish_poses`). Returns (weights, n_cycle_downweighted)."""
    w = rel["weight"]
    # Pose-evidence weighting: a pair whose cheirality vote covered only a
    # small fraction of its inliers produced a weakly-supported (R, t) —
    # scale its averaging weight by that fraction (floored, never zeroed).
    cheir = np.clip(
        rel["cheirality_good"] / np.maximum(rel["weight"], 1.0), 0.1, 1.0
    ).astype(np.float32)
    w = w * cheir
    if cfg.cycle_sigma_deg > 0:
        cyc = cycle_consistency_weights(
            rel["pairs"], rel["R"], sigma_deg=cfg.cycle_sigma_deg)
        w = w * cyc
        return w, int((cyc < 0.5).sum())
    return w, 0


def global_poses(table, K, num_images, config=None, mesh=None,
                 return_rel=False):
    """Solve all camera poses from the verified-pair table.

    Returns (rvec (N, 3), tvec (N, 3), placed (N,) bool) in the engine's
    x_cam = R x_world + t convention (t = -R C). ``placed`` marks cameras
    covered by at least one averaging pair; the rest keep identity and are
    left to guided registration. ``mesh`` shards the relative-pose stage
    (the init's dominant cost at scale) across devices.
    """
    from sfm_tpu.config import GlobalInitConfig

    import time as _time

    cfg = config or GlobalInitConfig()
    t0 = _time.time()
    rel = pairwise_relative_poses(
        table, K, min_inliers=cfg.min_pair_inliers,
        refine_gn_iters=cfg.gn_iters, max_matches=cfg.pair_matches,
        mesh=mesh,
    )
    t1 = _time.time()
    P = rel["pairs"].shape[0]
    w, n_down = _averaging_weights(rel, cfg)
    t2 = _time.time()
    forest = spanning_forest(rel["pairs"], w, num_images) if cfg.tree_init else None
    R_init = (tree_init_rotations(forest, rel["R"], num_images)
              if forest is not None else None)
    R_abs = rotation_averaging(
        rel["pairs"], rel["R"], w, num_images,
        power_iters=cfg.power_iters, refine_iters=cfg.refine_iters,
        init=R_init,
    )
    t3 = _time.time()
    C_init = (tree_init_centers(forest, R_abs, rel["pairs"], rel["t"],
                                num_images)
              if forest is not None else None)
    C = translation_averaging(
        rel["pairs"], R_abs, rel["t"], w, num_images,
        als_rounds=cfg.als_rounds, cg_iters=cfg.cg_iters, init=C_init,
    )
    t4 = _time.time()
    logger.info(
        "global init: %d pairs (%d cycle-downweighted); rel %.1fs cycle %.1fs "
        "rot %.1fs trans %.1fs",
        P, n_down, t1 - t0, t2 - t1, t3 - t2, t4 - t3)
    placed = np.zeros(num_images, bool)
    placed[rel["pairs"].ravel()] = True
    rvec = np.asarray(rotation_to_rvec(jnp.asarray(R_abs)), np.float32)
    tvec = -np.einsum("nab,nb->na", R_abs, C).astype(np.float32)
    if return_rel:
        rel["weight_eff"] = w
        return rvec, tvec, placed, rel
    return rvec, tvec, placed


def polish_poses(table, K, num_images, rvec, tvec, registered,
                 config=None, mesh=None):
    """Pose-graph drift correction for an incrementally-built model.

    Incremental SfM on long weakly-looped sequences accumulates a smooth
    pose drift that bundle adjustment cannot remove: BA minimizes
    reprojection residuals, which a drifted-but-self-consistent model
    already satisfies (1000-camera corridor, measured: 7.5 deg median GT
    rotation error at 0.45 px reprojection). The individual pairwise
    measurements are locally accurate (~0.1 deg) — only their COMPOSITION
    drifted — so this re-solves every registered camera's absolute pose in
    one shot: relative poses over the registered-registered subgraph of the
    verified-pair table, rotation averaging seeded from the current
    rotations, and scale-explicit-ALS translation averaging seeded from the
    current camera centers (the seeds keep both solvers convergent on
    large-diameter graphs, same mechanism as the spanning-tree init of the
    from-scratch global path — see :func:`translation_averaging`).

    Output scale is re-aligned to the input model (translation averaging
    normalizes the median baseline to 1; the caller's triangulated state
    and checkpoints live at the incremental scale).

    Returns ``(rvec', tvec', placed, rel)``; ``placed`` marks registered
    cameras covered by the averaging subgraph. Callers should UNREGISTER
    registered cameras outside it (``registered & ~placed``) and re-localize
    them by guided PnP — their incremental poses live in the old drifted
    gauge and cannot be mixed into the polished model.
    """
    import dataclasses as _dc

    from sfm_tpu.config import GlobalInitConfig

    cfg = config or GlobalInitConfig()
    registered = np.asarray(registered, bool)
    pairs_all = np.asarray(table.pairs)
    both = registered[pairs_all[:, 0]] & registered[pairs_all[:, 1]]
    sub = _dc.replace(table, accept=np.asarray(table.accept) & both)
    rel = pairwise_relative_poses(
        sub, K, min_inliers=cfg.min_pair_inliers,
        refine_gn_iters=cfg.gn_iters, max_matches=cfg.pair_matches,
        mesh=mesh,
    )
    w, n_down = _averaging_weights(rel, cfg)
    R_cur = np.asarray(rodrigues(jnp.asarray(rvec)), np.float32)
    C_cur = -np.einsum("nba,nb->na", R_cur, np.asarray(tvec, np.float32))

    def _solve(R_init, C_init):
        R_abs = rotation_averaging(
            rel["pairs"], rel["R"], w, num_images,
            power_iters=cfg.power_iters, refine_iters=cfg.refine_iters,
            init=R_init,
        )
        C = translation_averaging(
            rel["pairs"], R_abs, rel["t"], w, num_images,
            als_rounds=cfg.als_rounds, cg_iters=cfg.cg_iters,
            init=(tree_init_centers(forest, R_abs, rel["pairs"], rel["t"],
                                    num_images)
                  if C_init is None else C_init),
        )
        return R_abs, C

    def _score(R_abs):
        rv = np.asarray(rotation_to_rvec(jnp.asarray(R_abs)), np.float32)
        res = pair_rotation_residuals(rv, rel["pairs"], rel["R"])
        return (float(np.mean(res > cfg.consistency_warn_deg)),
                float(np.median(res)))

    # TWO averaging basins, scored by self-consistency. The incremental
    # seed is right when the model drifted SMOOTHLY (the common case — it
    # keeps the solvers convergent on large-diameter graphs). But an
    # incremental model with a sharp HINGE (pixel-500, measured: consecutive
    # pair errors of ~0.07 deg with a few 19-deg hinge links folding the
    # chain 92 deg vs GT) traps the seeded IRLS: from the folded basin the
    # true hinge-crossing measurements read as outliers and get
    # down-weighted, so polish converges back to the fold (6.8% gross-
    # outlier edges — inside the old adoption gate). The spanning-tree seed
    # (the from-scratch global basin) is hinge-free by construction; pick
    # whichever solution disagrees with fewer of its own measurements.
    R_inc, C_inc = _solve(R_cur, C_cur)
    forest = spanning_forest(rel["pairs"], w, num_images)
    R_tree, C_tree = _solve(
        tree_init_rotations(forest, rel["R"], num_images), None)
    s_inc, s_tree = _score(R_inc), _score(R_tree)
    if s_tree < s_inc:
        R_abs, C, seed_choice = R_tree, C_tree, "tree"
    else:
        R_abs, C, seed_choice = R_inc, C_inc, "incremental"
    rel["seed_choice"] = seed_choice
    logger.info(
        "polish seed selection: incremental (outliers %.1f%%, med %.2f deg) "
        "vs tree (%.1f%%, %.2f deg) -> %s",
        100 * s_inc[0], s_inc[1], 100 * s_tree[0], s_tree[1], seed_choice)
    i_idx, j_idx = rel["pairs"][:, 0], rel["pairs"][:, 1]
    base_in = np.linalg.norm(C_cur[j_idx] - C_cur[i_idx], axis=-1)
    base_out = np.linalg.norm(C[j_idx] - C[i_idx], axis=-1)
    if len(base_out):
        C = C * (float(np.median(base_in)) / max(float(np.median(base_out)), 1e-12))
    placed = np.zeros(num_images, bool)
    placed[rel["pairs"].ravel()] = True
    placed &= registered
    logger.info(
        "polish: %d pairs (%d cycle-downweighted) cover %d/%d registered "
        "cameras", rel["pairs"].shape[0], n_down, int(placed.sum()),
        int(registered.sum()))
    rvec_out = np.asarray(rotation_to_rvec(jnp.asarray(R_abs)), np.float32)
    tvec_out = -np.einsum("nab,nb->na", R_abs, C).astype(np.float32)
    return rvec_out, tvec_out, placed, rel


def pair_rotation_residuals(rvec, pairs, R_rel):
    """Angular residual (deg) of model rotations vs measured pair rotations.

    The one self-diagnostic a global reconstruction has without ground
    truth: reprojection error is blind to metric warps (bunny measured:
    0.33 px reprojection at 34%-of-scene ATE), but a model that disagrees
    with its own high-weight relative-rotation measurements flags an
    averaging-hostile graph (occluding-contour false consensus, weak
    cycles).
    """
    R_abs = np.asarray(rodrigues(jnp.asarray(rvec)))
    Ri = R_abs[pairs[:, 0]]
    Rj = R_abs[pairs[:, 1]]
    E = np.einsum("pba,pbc,pcd->pad", Rj, np.asarray(R_rel), Ri)
    tr = np.clip((np.trace(E, axis1=1, axis2=2) - 1.0) * 0.5, -1.0, 1.0)
    return np.degrees(np.arccos(tr))

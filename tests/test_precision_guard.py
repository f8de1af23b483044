"""Precision regression guard: geometry-critical programs must carry
explicit f32 (HIGHEST) matmul precision in their jaxprs.

TPU matmuls default to bf16. The CPU test suite cannot observe the
resulting error (CPU dots are true f32 either way), so this guard checks
the TRACE instead: every dot_general in the BA stack, the track
triangulator, the reprojection-stats program, and seed scoring must be
pinned to Precision.HIGHEST. Round-4 measured what a leak costs: the
corridor-1000 global reconstruction bent from 0.38 to 6.4 deg median
rotation error vs GT, and relaxed triangulation accepted 8.3k instead of
24.3k tracks, purely from default-precision dots in these programs.

Intentionally NOT covered: descriptor distance matmuls (matching/core.py,
_guided_match) — bulk MXU compute where bf16 is the right call.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfm_tpu.config import BAConfig


def _iter_eqns(jaxpr):
    for eqn in jaxpr.eqns:
        yield eqn
        for v in eqn.params.values():
            vals = v if isinstance(v, (list, tuple)) else [v]
            for item in vals:
                inner = getattr(item, "jaxpr", None)
                if inner is not None:
                    yield from _iter_eqns(inner)


def assert_all_dots_pinned(closed_jaxpr, what):
    n_dots = 0
    for eqn in _iter_eqns(closed_jaxpr.jaxpr):
        if eqn.primitive.name in ("dot_general", "conv_general_dilated"):
            n_dots += 1
            prec = eqn.params.get("precision")
            assert prec is not None, (
                f"{what}: {eqn.primitive.name} with DEFAULT (bf16-on-TPU) "
                f"precision — wrap the program in f32_matmuls")
    assert n_dots > 0, f"{what}: no dots found (test is vacuous)"


def test_triangulate_tracks_pinned():
    from sfm_tpu.reconstruction.incremental import _triangulate_tracks

    T, V, C = 6, 4, 3
    jpr = jax.make_jaxpr(
        lambda *a: _triangulate_tracks(*a, max_err=4.0, min_parallax_deg=0.0,
                                       robust_rounds=1, seed_pairs_on=True,
                                       n_seed=3)
    )(
        jnp.zeros((T, V), jnp.int32), jnp.zeros((T, V, 2), jnp.float32),
        jnp.ones((T, V), bool), jnp.zeros((C, 3), jnp.float32),
        jnp.zeros((C, 3), jnp.float32), jnp.ones(C, bool),
        jnp.eye(3, dtype=jnp.float32), jnp.ones(T, bool),
    )
    assert_all_dots_pinned(jpr, "_triangulate_tracks")


def test_reproj_stats_pinned():
    from sfm_tpu.reconstruction.incremental import _reproj_stats

    T, V, C, P = 6, 4, 3, 6
    jpr = jax.make_jaxpr(_reproj_stats)(
        jnp.zeros((T, V), jnp.int32), jnp.zeros((T, V, 2), jnp.float32),
        jnp.ones((T, V), bool), jnp.zeros((C, 3), jnp.float32),
        jnp.zeros((C, 3), jnp.float32), jnp.ones(C, bool),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros((P, 3), jnp.float32),
        jnp.ones(P, bool),
    )
    assert_all_dots_pinned(jpr, "_reproj_stats")


def test_seed_scoring_pinned():
    from sfm_tpu.reconstruction.seed import _score_pairs

    B, N = 2, 16
    jpr = jax.make_jaxpr(_score_pairs)(
        jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, 1, 1)),
        jnp.zeros((B, N, 2), jnp.float32), jnp.zeros((B, N, 2), jnp.float32),
        jnp.ones((B, N), bool), jnp.eye(3, dtype=jnp.float32),
    )
    assert_all_dots_pinned(jpr, "_score_pairs")


def _tiny_problem():
    from sfm_tpu.ba.problem import build_problem

    C, P, O = 3, 5, 12
    rng = np.random.default_rng(0)
    return build_problem(
        rvec=np.zeros((C, 3), np.float32),
        tvec=rng.normal(size=(C, 3)).astype(np.float32),
        cam_valid=np.ones(C, bool),
        intr=np.array([100.0, 100.0, 50.0, 50.0], np.float32),
        points=rng.normal(size=(P, 3)).astype(np.float32) + [0, 0, 5],
        point_valid=np.ones(P, bool),
        obs_cam=rng.integers(0, C, O).astype(np.int32),
        obs_point=rng.integers(0, P, O).astype(np.int32),
        obs_xy=rng.normal(size=(O, 2)).astype(np.float32) * 10 + 50,
        obs_valid=np.ones(O, bool),
    )


@pytest.mark.parametrize("dense", [True, False])
def test_run_ba_pinned(dense):
    from sfm_tpu.ba.lm import _run_ba_jit

    prob = _tiny_problem()
    cfg = BAConfig(max_iterations=2, cg_iters=4, optimize_intrinsics=False,
                   use_dense_schur_below=16 if dense else 0)
    jpr = jax.make_jaxpr(
        lambda p: _run_ba_jit(p, cfg, None, False, None), static_argnums=()
    )(prob)
    assert_all_dots_pinned(jpr, f"_run_ba_jit(dense={dense})")


def test_run_ba_blocked_pinned():
    from sfm_tpu.ba.blocked import build_blocked_problem, run_ba_blocked

    C, P, V = 3, 5, 4
    rng = np.random.default_rng(0)
    prob = build_blocked_problem(
        rvec=np.zeros((C, 3), np.float32),
        tvec=rng.normal(size=(C, 3)).astype(np.float32),
        cam_valid=np.ones(C, bool),
        intr=np.array([100.0, 100.0, 50.0, 50.0], np.float32),
        points=rng.normal(size=(P, 3)).astype(np.float32) + [0, 0, 5],
        point_valid=np.ones(P, bool),
        obs_cam=rng.integers(0, C, (P, V)).astype(np.int32),
        obs_xy=(rng.normal(size=(P, V, 2)) * 10 + 50).astype(np.float32),
        obs_valid=np.ones((P, V), bool),
    )
    cfg = BAConfig(max_iterations=2, cg_iters=4, optimize_intrinsics=False)
    jpr = jax.make_jaxpr(lambda p: run_ba_blocked(p, cfg, None, False))(prob)
    assert_all_dots_pinned(jpr, "run_ba_blocked")

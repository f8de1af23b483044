"""Test harness: force JAX onto 8 virtual CPU devices so multi-chip sharding
is testable without TPU hardware (SURVEY.md section 4's implication)."""
import os

# Must run before the first jax backend initialization anywhere in the test
# session. A sitecustomize in this image force-sets JAX_PLATFORMS=axon (TPU),
# so the env var alone is not enough — use jax.config as well.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from pathlib import Path

import numpy as np
import pytest

BUNNY_DIR = Path("/root/reference/bunny_data")


@pytest.fixture(scope="session")
def bunny_dir():
    if not BUNNY_DIR.exists():
        pytest.skip("bunny dataset not available")
    return BUNNY_DIR


@pytest.fixture(scope="session")
def bunny_calib(bunny_dir):
    """Ground-truth (K, R, t) for every bunny view, from the CONTOUR files."""
    from sfm_tpu.io.calib import load_projection_matrix, decompose_projection

    out = {}
    for p in sorted((bunny_dir / "calib").glob("*.txt")):
        P = load_projection_matrix(p)
        out[int(p.stem)] = (P, *decompose_projection(P))
    return out


@pytest.fixture()
def rng():
    # Function-scoped on purpose: a shared stream makes every test's draws
    # depend on which tests ran before it (adding a test can flip a marginal
    # RANSAC case elsewhere). Fresh deterministic stream per test.
    return np.random.default_rng(42)

"""Pallas kernel parity tests (interpret mode on the CPU mesh; the same
kernels compile natively on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfm_tpu.ops import match_top2_pallas, match_top2_reference


def unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


class TestMatchTop2:
    @pytest.mark.parametrize("k1,k2", [(256, 512), (512, 1024)])
    def test_matches_reference(self, rng, k1, k2):
        d1 = unit(rng.normal(size=(k1, 128))).astype(np.float32)
        d2 = unit(rng.normal(size=(k2, 128))).astype(np.float32)
        valid2 = rng.uniform(size=k2) > 0.2
        b_ref, s_ref, i_ref = match_top2_reference(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(valid2)
        )
        b, s, i = match_top2_pallas(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(valid2),
            tile_m=128, tile_n=128, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))

    def test_second_best_across_tiles(self, rng):
        """Best and second-best in different tiles must still be found."""
        d2 = unit(rng.normal(size=(512, 32))).astype(np.float32)
        # Query nearly equal to d2[5] (tile 0) and d2[400] (tile 1).
        q = unit(d2[5] + 1e-3 * rng.normal(size=32)).astype(np.float32)
        d2[400] = unit(q + 2e-3 * rng.normal(size=32))
        d1 = np.tile(q, (128, 1)).astype(np.float32)
        valid2 = np.ones(512, bool)
        b, s, i = match_top2_pallas(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(valid2),
            tile_m=128, tile_n=128, interpret=True,
        )
        b_ref, s_ref, i_ref = match_top2_reference(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(valid2)
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-6)

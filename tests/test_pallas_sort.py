"""Bitonic sort kernel vs numpy lexsort (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sage_icp_tpu.ops import pallas_sort as ps


@pytest.mark.parametrize("n", [256, 2048])
def test_bitonic_matches_lexsort(rng, n):
    k1 = rng.integers(0, 7, n).astype(np.uint32)  # heavy duplicates
    k2 = rng.integers(0, 5, n).astype(np.uint32)
    idx = np.arange(n, dtype=np.int32)
    x = rng.normal(size=n).astype(np.float32)
    out = ps.bitonic_sort_planes(
        (jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(idx), jnp.asarray(x)),
        num_keys=3,
        interpret=True,
    )
    sk1, sk2, sidx, sx = (np.asarray(o) for o in out)
    ref = np.lexsort((idx, k2, k1))
    np.testing.assert_array_equal(sk1, k1[ref])
    np.testing.assert_array_equal(sk2, k2[ref])
    np.testing.assert_array_equal(sidx, ref)  # iota key => stable order
    np.testing.assert_array_equal(sx, x[ref])


def test_bitonic_single_key_presorted(rng):
    n = 512
    k = np.arange(n, dtype=np.int32)
    out = ps.bitonic_sort_planes(
        (jnp.asarray(k), jnp.asarray(k.astype(np.int32))), num_keys=1,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out[0]), k)

"""Native C++ runtime kernels match their numpy fallbacks exactly
(reference: the pyop2 sparsity.pyx role — SURVEY §2.9)."""
import numpy as np

from firedrake_tpu.native import coo_sort_unique, _load


def _numpy_ref(keys):
    vm = keys >= 0
    u = np.unique(keys[vm])
    p = np.searchsorted(u, keys).astype(np.int32)
    p[~vm] = len(u)
    return u, p


def test_coo_sort_unique_matches_numpy():
    rng = np.random.RandomState(42)
    keys = rng.randint(0, 997, size=20000).astype(np.int64)
    keys[::11] = -1                     # restricted-dof sentinels
    u, p = coo_sort_unique(keys)
    u2, p2 = _numpy_ref(keys)
    assert np.array_equal(u, u2)
    assert np.array_equal(p, p2)


def test_sparsity_uses_native_consistently():
    """Assembled matrices are identical whichever backend built the
    sparsity (the whole suite exercises the wired path; this pins the
    direct contract)."""
    keys = np.array([5, 3, 5, -1, 0, 3], dtype=np.int64)
    u, p = coo_sort_unique(keys)
    assert list(u) == [0, 3, 5]
    assert list(p) == [2, 1, 2, 3, 0, 1]

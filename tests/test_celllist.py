import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from sphtpu.neighbors import knn_celllist


def _check_exact(pos, k, h_hint, **kw):
    idx, info = knn_celllist(jnp.asarray(pos), k, jnp.asarray(h_hint), **kw)
    idx = np.asarray(idx)
    _, idx_ref = cKDTree(pos).query(pos, k=k)
    for i in range(len(pos)):
        assert set(idx[i]) == set(idx_ref[i]), i
    return info


def test_celllist_uniform_certified():
    rng = np.random.default_rng(0)
    n, k = 4000, 32
    pos = rng.random((n, 3))
    # steady-state hint: the true per-particle h, as the engine carries it
    d, _ = cKDTree(pos).query(pos, k=k)
    h_hint = d[:, -1] / 2
    info = _check_exact(pos, k, h_hint, row_block=512, cap=128)
    assert bool(info.certified)
    assert not bool(info.fell_back)


def test_celllist_bad_hint_falls_back_exact():
    """A terrible h hint must still give the exact answer via fallback."""
    rng = np.random.default_rng(1)
    n, k = 1500, 16
    pos = rng.standard_normal((n, 3))
    h_hint = np.full(n, 1e-4)  # tiny cells -> too few candidates
    info = _check_exact(pos, k, h_hint, row_block=512)
    assert not bool(info.certified)


def test_celllist_clustered_gaussian():
    """Strong central clustering: either certified or fallback, but always
    exact."""
    rng = np.random.default_rng(2)
    n, k = 3000, 24
    pos = rng.standard_normal((n, 3)) * np.array([1.0, 1.0, 1.0])
    pos[: n // 2] *= 0.05  # dense core
    d, _ = cKDTree(pos).query(pos, k=k)
    h_hint = d[:, -1] / 2  # perfect hint
    info = _check_exact(pos, k, h_hint, row_block=512, cap=128)
    assert np.asarray(info.n_residual) >= 0


def test_celllist_self_first_and_sorted():
    rng = np.random.default_rng(3)
    n, k = 2000, 12
    pos = rng.random((n, 3))
    d, _ = cKDTree(pos).query(pos, k=k)
    h_hint = d[:, -1] / 2
    idx, info = knn_celllist(jnp.asarray(pos), k, jnp.asarray(h_hint), row_block=512)
    idx = np.asarray(idx)
    assert (idx[:, 0] == np.arange(n)).all()
    # ascending distance order
    dmat = np.linalg.norm(pos[:, None, :] - pos[idx], axis=-1)
    assert (np.diff(dmat, axis=1) >= -1e-12).all()

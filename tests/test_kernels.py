import numpy as np

from sphtpu.kernels import W, grad_W_over_r, softened_gphi_over_r, softened_phi


def test_W_normalization():
    """4 pi Int_0^2h W(r) r^2 dr == 1."""
    h = 0.7
    r = np.linspace(1e-9, 2 * h, 200001)
    w = np.asarray(W(r / h, np.full_like(r, h)))
    integral = 4 * np.pi * np.trapezoid(w * r**2, r)
    assert abs(integral - 1.0) < 1e-6


def test_W_compact_support():
    h = 1.0
    assert float(W(np.array(2.5), np.array(h))) == 0.0
    assert float(W(np.array(0.0), np.array(h))) == 1.0 / np.pi


def test_gradW_matches_finite_difference():
    h = 0.9
    r = np.linspace(0.05, 2 * h - 0.05, 1000)
    eps = 1e-6
    wp = np.asarray(W((r + eps) / h, np.full_like(r, h)))
    wm = np.asarray(W((r - eps) / h, np.full_like(r, h)))
    dw_fd = (wp - wm) / (2 * eps)
    dw = np.asarray(grad_W_over_r(r / h, r, np.full_like(r, h))) * r
    np.testing.assert_allclose(dw, dw_fd, rtol=1e-5, atol=1e-8)


def test_gradW_zero_at_origin():
    # self-pair: grad W = (dW/dr)/r * d with d = 0 must be finite * 0
    g = float(grad_W_over_r(np.array(0.0), np.array(0.0), np.array(1.0)))
    assert np.isfinite(g)


def test_phi_continuity_and_far_field():
    h = 1.3
    for q0 in (1.0, 2.0):
        lo = np.asarray(softened_phi(np.array(q0 * h - 1e-9), np.array(h)))
        hi = np.asarray(softened_phi(np.array(q0 * h + 1e-9), np.array(h)))
        assert abs(lo - hi) < 1e-7
        glo = np.asarray(softened_gphi_over_r(np.array(q0 * h - 1e-9), np.array(h)))
        ghi = np.asarray(softened_gphi_over_r(np.array(q0 * h + 1e-9), np.array(h)))
        assert abs(glo - ghi) < 1e-7
    r = np.array(10.0 * h)
    assert abs(float(softened_phi(r, np.array(h))) + 1.0 / float(r)) < 1e-12
    assert abs(float(softened_gphi_over_r(r, np.array(h))) - 1.0 / float(r) ** 3) < 1e-12


def test_gphi_is_dphi_dr_over_r():
    h = 0.8
    r = np.linspace(0.05, 3 * h, 2000)
    eps = 1e-6
    pp = np.asarray(softened_phi(r + eps, np.full_like(r, h)))
    pm = np.asarray(softened_phi(r - eps, np.full_like(r, h)))
    dphi_fd = (pp - pm) / (2 * eps)
    gphi = np.asarray(softened_gphi_over_r(r, np.full_like(r, h))) * r
    np.testing.assert_allclose(gphi, dphi_fd, rtol=2e-4, atol=1e-8)


def test_phi_at_zero_is_self_softening():
    """phi(0; h) = -7/5/h — the origin of the reference's self-potential
    correction (gravOctree_Single.jl:303)."""
    h = 2.0
    assert abs(float(softened_phi(np.array(0.0), np.array(h))) + 1.4 / h) < 1e-12

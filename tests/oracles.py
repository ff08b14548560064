"""Independent brute-force numpy float64 oracles for the device physics.

Deliberately written as naive per-pair loops straight from the reference
formulas (not from the sphtpu implementation), recreating the reference's
baseline-vs-fast oracle relationship (SURVEY.md §4) as automated tests.
"""

import numpy as np
from scipy.spatial import cKDTree


def w_spline(r, h):
    q = r / h
    ct = 1.0 / (np.pi * h**3)
    if q <= 1.0:
        return ct * (1 - 1.5 * q**2 + 0.75 * q**3)
    if q <= 2.0:
        return ct * 0.25 * (2 - q) ** 3
    return 0.0


def dw_dr_over_r(r, h):
    q = r / h
    ct = 1.0 / (np.pi * h**4)
    if q <= 1.0:
        return ct * (2.25 * r / h**2 - 3.0 / h)
    if q <= 2.0:
        return ct * (-0.75 * (2 - q) ** 2) / r
    return 0.0


def grav_kernels(r, h):
    """(gphi_over_r, phi) — GJL.Kernels piecewise forms."""
    q = r / h
    if q <= 1.0:
        gphi = (1 / h**2) * (4 / 3 / h - 6 / 5 * (r**2 / h**3) + 0.5 * (r**3 / h**4))
        phi = (1 / h) * (2 / 3 * q**2 - 0.3 * q**4 + 0.1 * q**5 - 1.4)
    elif q <= 2.0:
        gphi = (
            (1 / h**2)
            * (8 / 3 * q - 3 * q**2 + 1.2 * q**3 - q**4 / 6 - 1 / 15 / q**2)
            / r
        )
        phi = (1 / h) * (
            4 / 3 * q**2 - q**3 + 0.3 * q**4 - q**5 / 30 - 1.6 + 1 / 15 / q
        )
    else:
        gphi = 1 / r**3
        phi = -1 / r
    return gphi, phi


def oracle_sph(pos, vel, m, K, eos, gamma, cs0, alpha, beta, kh):
    """Returns dict with rho, h, cs, acc (hydro only), Pi, v_dot_dW, idx."""
    n = len(pos)
    tree = cKDTree(pos)
    r_knn, idx = tree.query(pos, k=kh)
    h = r_knn[:, -1] / 2.0

    rho = np.zeros(n)
    for i in range(n):
        for j in idx[i]:
            rho[i] += m * w_spline(np.linalg.norm(pos[i] - pos[j]), h[i])

    if eos == "polytropic":
        cs = np.sqrt(gamma * K * rho ** (gamma - 1))
        P = K * rho**gamma
    else:
        cs = np.full(n, cs0)
        P = cs0**2 * rho

    acc = np.zeros((n, 3))
    Pi_mat = np.zeros((n, kh))
    vdw_mat = np.zeros((n, kh))
    mu_mat = np.zeros((n, kh))
    for i in range(n):
        for jj in range(kh):
            j = idx[i, jj]
            d = pos[i] - pos[j]
            r = np.linalg.norm(d)
            h_avg = 0.5 * (h[i] + h[j])
            rho_avg = 0.5 * (rho[i] + rho[j])
            vij = vel[i] - vel[j]
            mu = min(h_avg * np.dot(vij, d) / (r**2 + 0.01 * h_avg**2), 0.0)
            Pi = (-alpha * cs[i] * mu + beta * mu**2) / rho_avg
            dW = dw_dr_over_r(r, h[i]) * d
            Pi_mat[i, jj] = Pi
            vdw_mat[i, jj] = np.dot(vij, dW)
            mu_mat[i, jj] = mu
            if j == i:
                continue
            if eos == "polytropic":
                ct = m * ((P[i] / rho[i] ** 2 + P[j] / rho[j] ** 2) + Pi) / 2.0
            else:
                ct = m * (P[i] / rho[i] ** 2 + Pi / 2.0)
            acc[i] -= ct * dW
            acc[j] += ct * dW
    return dict(
        rho=rho, h=h, cs=cs, acc=acc, Pi=Pi_mat, v_dot_dW=vdw_mat, mu=mu_mat, idx=idx
    )


def oracle_gravity(pos, h, m):
    n = len(pos)
    g = np.zeros((n, 3))
    phi = np.zeros(n)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = pos[i] - pos[j]
            r = np.linalg.norm(d)
            gphi, p = grav_kernels(r, 0.5 * (h[i] + h[j]))
            g[i] += m * gphi * d
            phi[i] += m * p
    phi -= 1.4 * m / h
    return g, phi


def oracle_evolve_K(Kv, m, idx, Pi, v_dot_dW, gamma, rho, dt):
    n, kh = Pi.shape
    dk = np.zeros(n)
    for i in range(n):
        for jj in range(kh):
            j = idx[i, jj]
            if j == i:
                continue
            ct = m * Pi[i, jj] * v_dot_dW[i, jj] / 2.0
            dk[i] += ct
            dk[j] += ct
    return Kv + (0.5 * (gamma - 1) / rho ** (gamma - 1) * dk) * (dt / 2.0)

"""Single-core CPU baseline for vs_baseline: the reference's algorithm
class, re-implemented with components at least as fast as the Julia
original, timed on one force pass.

The reference (george-toka/Astrophysical-SPH) publishes no numbers and
Julia is not available in this image (BASELINE.md), so the baseline is
constructed from the same algorithms the reference uses per force pass
(polytrope_sim.jl:161: hydrodynamics + gravity):

  - kNN (Kh=50) via scipy.spatial.cKDTree (C) — the reference uses
    NearestNeighbors.jl (pure Julia KD-tree), so this leg is GENEROUS
    to the baseline
  - density / AV / pressure / gradW / symmetric pair sums as vectorized
    numpy over the (N, Kh) neighbor table — the reference runs masked
    Julia loops per pair (polytrope_hydroKDTree.jl:5-73 W/gradW), again
    generous
  - Barnes-Hut octree gravity via the reference-faithful C oracle
    (physics/oracle_bh.c, theta = 0.576, the same dual opening criterion
    as gravOctree_Single.jl:265)

A KDK step is two such passes (polytrope_sim.jl:161,218). The resulting
particle-steps/s is therefore an UPPER bound on what the Julia reference
achieves on this host, and vs_baseline = sphtpu / this is a LOWER bound
on the true speedup.

Usage: python baseline_cpu.py [N] -> one JSON line.
"""

import json
import sys
import time

import numpy as np
from scipy.spatial import cKDTree

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
KH = 50


def hydro_pass(pos, vel, m, K, gamma, alpha, beta):
    """One O(N*Kh) hydro evaluation, reference semantics
    (polytrope_hydroKDTree.jl:251-292), vectorized numpy."""
    t0 = time.time()
    tree = cKDTree(pos)
    d, idx = tree.query(pos, k=KH, workers=1)
    t_knn = time.time() - t0

    t0 = time.time()
    h = d[:, -1] / 2.0  # :151
    hcol = h[:, None]
    q = d / hcol
    # cubic spline W (:5-35)
    w = np.where(
        q <= 1.0,
        1.0 - 1.5 * q**2 + 0.75 * q**3,
        np.where(q <= 2.0, 0.25 * (2.0 - q) ** 3, 0.0),
    ) / (np.pi * hcol**3)
    rho = m * w.sum(axis=1)

    dx = pos[:, 0:1] - pos[:, 0][idx]
    dy = pos[:, 1:2] - pos[:, 1][idx]
    dz = pos[:, 2:3] - pos[:, 2][idx]
    vx = vel[:, 0:1] - vel[:, 0][idx]
    vy = vel[:, 1:2] - vel[:, 1][idx]
    vz = vel[:, 2:3] - vel[:, 2][idx]
    v_dot_r = vx * dx + vy * dy + vz * dz
    h_avg = 0.5 * (hcol + h[idx])
    rho_avg = 0.5 * (rho[:, None] + rho[idx])
    cs = np.sqrt(gamma * K * rho ** (gamma - 1.0))
    mu = np.minimum(h_avg * v_dot_r / (d * d + 0.01 * h_avg**2), 0.0)
    Pi = (-alpha * cs[:, None] * mu + beta * mu**2) / rho_avg
    P = K * rho**gamma
    por2 = P / rho**2
    # gradW (:38-73)
    dwdr = np.where(
        q <= 1.0,
        -3.0 * q + 2.25 * q**2,
        np.where(q <= 2.0, -0.75 * (2.0 - q) ** 2, 0.0),
    ) / (np.pi * hcol**4)
    dwdr_over_r = np.where(d > 0, dwdr / np.where(d > 0, d, 1.0), 0.0)
    ct = m * (por2[:, None] + por2[idx] + Pi) / 2.0
    ct[:, 0] = 0.0  # self column
    coeff = ct * dwdr_over_r
    ax = -np.sum(coeff * dx, axis=1)
    ay = -np.sum(coeff * dy, axis=1)
    az = -np.sum(coeff * dz, axis=1)
    # symmetric scatter leg (hydroCalculation :229-245)
    np.add.at(ax, idx.ravel(), (coeff * dx).ravel())
    np.add.at(ay, idx.ravel(), (coeff * dy).ravel())
    np.add.at(az, idx.ravel(), (coeff * dz).ravel())
    t_hydro = time.time() - t0
    return h, t_knn, t_hydro, (ax, ay, az)


def main():
    from sphtpu.physics.oracle_bh import bh_gravity

    rng = np.random.default_rng(42)
    u = rng.random((N, 3))
    r = u[:, 0] ** (1 / 3)
    costh = 2 * u[:, 1] - 1
    ph = 2 * np.pi * u[:, 2]
    sinth = np.sqrt(1 - costh**2)
    pos = np.stack(
        [r * sinth * np.cos(ph), r * sinth * np.sin(ph), r * costh], axis=1
    )
    vel = 0.05 * rng.standard_normal((N, 3))
    K = np.full(N, 0.02)
    m = 1.0 / N

    # warm pass (page in, JIT-free but cache-warm), then timed pass
    h, t_knn, t_hydro, _ = hydro_pass(pos, vel, m, K, 5.0 / 3.0, 1.0, 2.0)
    t0 = time.time()
    g = bh_gravity(pos, h, m, theta=0.576)
    t_grav = time.time() - t0
    assert g is not None, "C toolchain required for the octree leg"

    h, t_knn, t_hydro, _ = hydro_pass(pos, vel, m, K, 5.0 / 3.0, 1.0, 2.0)
    t0 = time.time()
    bh_gravity(pos, h, m, theta=0.576)
    t_grav = time.time() - t0

    t_pass = t_knn + t_hydro + t_grav
    ps = N / (2.0 * t_pass)  # 2 force passes per KDK step
    print(
        json.dumps(
            {
                "N": N,
                "baseline_particle_steps_per_s": round(ps, 1),
                "ms_per_force_pass": round(t_pass * 1e3, 1),
                "t_knn_s": round(t_knn, 3),
                "t_hydro_s": round(t_hydro, 3),
                "t_octree_s": round(t_grav, 3),
                "note": "single-core C/scipy/numpy stand-in for the Julia "
                "reference; generous to the baseline (see docstring)",
            }
        )
    )


if __name__ == "__main__":
    main()

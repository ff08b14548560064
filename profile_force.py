"""On-chip force-pass breakdown for the production engines.

Times the individual components of one force evaluation on the real TPU:
the headline uniform state (mono tile engine + exact Newton sweep) and the
committed deep-collapse fixture (block-compact engine). Used to direct
optimization work (BASELINE.md perf tables); not part of the test suite.

Usage:
    python profile_force.py uniform       # headline config breakdown
    python profile_force.py deep          # deep-collapse fixture breakdown
    SPHTPU_BLOCKS_PHASE=a python profile_force.py deep   # phase-A-only
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REPS = 4


def timeit(label, fn, *args):
    out = fn(*args)
    [np.asarray(leaf).ravel()[:1] for leaf in jax.tree.leaves(out)]
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
        [np.asarray(leaf).ravel()[:1] for leaf in jax.tree.leaves(out)]
    dt = (time.time() - t0) / REPS
    print(f"{label:42s} {dt * 1e3:9.1f} ms")
    return out


def load_uniform():
    from scipy.spatial import cKDTree

    from sphtpu import constants as C
    from sphtpu.scenes.generators import boss_bodenheimer
    from sphtpu.scenes.setup import DEFAULTS
    from sphtpu.units import UnitSystem

    n = 100_000
    rng = np.random.default_rng(42)
    R, M = DEFAULTS["R"], DEFAULTS["M"]
    pos, vel, rho_vec = boss_bodenheimer(n, R, M, rng=rng)
    gamma = DEFAULTS["gamma"]
    K_cgs = C.KB * DEFAULTS["T"] / (
        DEFAULTS["mu"] * C.MH * rho_vec[0] ** (gamma - 1.0)
    )
    u = UnitSystem.from_constants(C.G_CGS, M, R)
    pos_code = pos / u.L
    d_knn, _ = cKDTree(pos_code).query(pos_code, k=50)
    h0 = d_knn[:, -1] / 2.0
    return (
        pos_code, vel / u.V, np.full(n, K_cgs) / u.K_entropy(gamma), h0,
        M / n / u.M, gamma,
    )


def load_deep(path="bench_data/bb_collapsed_deep.npz"):
    d = np.load(path)
    return (
        d["pos"], d["vel"], d["K"], d["h"], float(d["m"]), 5.0 / 3.0,
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "deep"
    kh = 50
    jd = jnp.float32
    if which == "uniform":
        pos, vel, K, h0, m, gamma = load_uniform()
    else:
        pos, vel, K, h0, m, gamma = load_deep()
    n = pos.shape[0]
    posd = jnp.asarray(pos, jd)
    veld = jnp.asarray(vel, jd)
    Kd = jnp.asarray(K, jd)
    hd = jnp.asarray(h0, jd)
    md = jnp.asarray(m, jd)
    print(f"state={which} N={n} h_ratio={h0.max() / h0.min():.1f} "
          f"backend={jax.default_backend()}")

    from sphtpu.physics.gravity import gravity_newton_allpairs

    timeit("gravity_newton_allpairs", lambda: gravity_newton_allpairs(posd, md))

    if which == "uniform":
        from sphtpu.physics.tiles import choose_tile_params, tile_sph_forces

        tile = choose_tile_params(pos, h0, kh)
        print(f"tile spec: grid={tile[0]} cap={tile[1]}")

        def hydro():
            return tile_sph_forces(
                posd, veld, md, Kd, hd,
                eos="polytropic", gamma=gamma, cs0=0.0, alpha=1.0, beta=2.0,
                kh=kh, grid=tile[0], cap=tile[1], mesh_factor=0,
                sigma_cells=2.2, pallas_a=True, outlier_budget=0,
            )

        timeit("tile_sph_forces (phase A+B+corr)", hydro)
    else:
        from sphtpu.physics.blocks import (
            block_sph_forces, build_cand_tables, plan_blocks,
        )

        grav = "exact" if n < 150_000 else "p3m"
        blk = plan_blocks(pos, h0, kh, gravity=grav)
        assert blk is not None
        spec, bargs = blk
        print(f"block spec: buckets={spec[0]} octs={spec[1]} "
              f"slots={sum(cb * nb for cb, nb in spec[0]) * 128 / 1e6:.0f}M "
              f"gravity={grav}")
        bargs = jax.tree.map(jnp.asarray, bargs)

        tables = timeit(
            "build_cand_tables",
            lambda: build_cand_tables(bargs, spec, n),
        )

        def blocks(aux):
            return block_sph_forces(
                posd, veld, md, Kd, hd, bargs,
                eos="polytropic", gamma=gamma, cs0=0.0, alpha=1.0, beta=2.0,
                kh=kh, spec=spec, gravity=grav, idx_tables=aux,
            )

        timeit(
            f"block_sph_forces (PHASE={os.environ.get('SPHTPU_BLOCKS_PHASE', 'full')!r})",
            blocks, tables,
        )


if __name__ == "__main__":
    main()

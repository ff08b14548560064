"""Where does the hard-regime force pass spend its 712 ms?

Microbenches the block engine's per-eval cost components ON THE CHIP,
each as its own jitted function over the real deep-fixture plan:

  * full block_sph_forces eval (reference point)
  * phase A only (SPHTPU_BLOCKS_PHASE=a equivalent via flag)
  * the candidate-table field gathers (10 fields x T rows, per bucket,
    exactly the cpre/cf gather pattern of block_sph_forces)
  * the same data moved as ONE fused (T, 10) row gather + transpose
  * the fused (n+1, 8) scatter-add (per bucket vs one concatenated)
  * the phase B pallas launches alone on pre-gathered planes

Findings feed the merged-phase-B design (VERDICT r5 ask 2). Not part of
the test suite.

Usage: python exp_blocks_breakdown.py [deep|iso]
"""

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
    print(f"{label:52s} {dt * 1e3:9.1f} ms", flush=True)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "deep"
    kh = 50
    jd = jnp.float32
    if which == "iso":
        # rebuild the iso bench fixture state (r^-2 cusp -> block plan)
        import tempfile

        from scipy.spatial import cKDTree

        from sphtpu.io import read_snapshot, snapshot_path
        from sphtpu.scenes.setup import iniconds_setup
        from sphtpu.units import UnitSystem

        with tempfile.TemporaryDirectory() as root:
            iniconds_setup(
                "isothermal", "sample_isothermal_sphere", root=root,
                N=100_000, rng=42,
            )
            snap = read_snapshot(
                snapshot_path(root, "sample_isothermal_sphere", "1")
            )
        c = dict(snap["constants"])
        u = UnitSystem.from_constants(
            float(c["G"]), float(c["M"]), float(c["R"])
        )
        pos = np.asarray(snap["pos"]) / u.L
        d_knn, _ = cKDTree(pos).query(pos, k=kh)
        h0 = d_knn[:, -1] / 2.0
        vel = np.asarray(snap["vel"]) / u.V
        K = np.zeros(len(pos))
        m = float(c["m"]) / u.M
    else:
        d = np.load("bench_data/bb_collapsed_deep.npz")
        pos, vel, K, h0, m = d["pos"], d["vel"], d["K"], d["h"], float(d["m"])
    n = pos.shape[0]

    from sphtpu.physics.blocks import (
        BQ, block_sph_forces, build_cand_tables, plan_blocks,
    )

    grav = "exact" if n < 150_000 else "p3m"
    blk = plan_blocks(pos, h0, kh, gravity=grav)
    assert blk is not None
    spec, bargs = blk
    buckets = spec[0]
    T = sum(cb * nb for cb, nb in buckets)
    print(
        f"state={which} N={n} buckets={len(buckets)} blocks="
        f"{sum(nb for _, nb in buckets)} table_rows={T / 1e6:.2f}M "
        f"slots={T * BQ / 1e6:.0f}M"
    )
    bargs = jax.tree.map(jnp.asarray, bargs)
    posd = jnp.asarray(pos, jd)
    veld = jnp.asarray(vel, jd)
    Kd = jnp.asarray(K, jd)
    hd = jnp.asarray(h0, jd)
    md = jnp.asarray(m, jd)

    tables = timeit(
        "build_cand_tables (hoisted per sub-chunk)",
        jax.jit(lambda b: build_cand_tables(b, spec, n)), bargs,
    )

    def full(aux):
        return block_sph_forces(
            posd, veld, md, Kd, hd, bargs,
            eos="polytropic", gamma=5.0 / 3.0, cs0=0.0, alpha=1.0, beta=2.0,
            kh=kh, spec=spec, gravity=grav, idx_tables=aux,
        )

    timeit("block_sph_forces FULL eval", jax.jit(full), tables)

    # ---- component microbenches on the real tables ----
    idx_list = tables.idx  # list of (nb, C_b) int32
    rows_list = tables.rows

    # per-bucket 10-field gathers (the engine's current cf/cpre pattern)
    fields = [jnp.asarray(np.random.default_rng(i).standard_normal(n + 1),
                          jd) for i in range(10)]

    @jax.jit
    def gathers_per_bucket(fs):
        outs = []
        for idx in idx_list:
            outs.append([f[idx] for f in fs])
        return outs

    timeit("candidate gathers: 10 fields x per-bucket", gathers_per_bucket,
           fields)

    @jax.jit
    def gathers_3(fs):
        outs = []
        for idx in idx_list:
            outs.append([f[idx] for f in fs[:3]])
        return outs

    timeit("candidate gathers: 3 fields x per-bucket", gathers_3, fields)

    # one fused (T, 10) row gather through a concatenated flat table
    idx_flat = jnp.concatenate([i.reshape(-1) for i in idx_list])
    fmat = jnp.stack(fields, axis=1)  # (n+1, 10)

    @jax.jit
    def gather_fused(fm):
        return fm[idx_flat]  # (T, 10)

    timeit("candidate gather: ONE fused (T, 10) row gather", gather_fused,
           fmat)

    @jax.jit
    def gather_fused_t(fm):
        g = fm[idx_flat]  # (T, 10)
        cw = 512
        return jnp.swapaxes(g.reshape(-1, cw, 10), 1, 2)  # (chunks, 10, cw)

    timeit("  + reshape/transpose to (chunks, 10, 512)", gather_fused_t,
           fmat)

    # the fused row-order scatter-add: per bucket vs one concatenated
    upds = [
        jnp.asarray(
            np.random.default_rng(7).standard_normal((int(r.size), 8)), jd
        )
        for r in rows_list
    ]

    @jax.jit
    def scatter_per_bucket(us):
        cacc = jnp.zeros((n + 1, 8), jd)
        for r, u in zip(rows_list, us):
            cacc = cacc.at[r.reshape(-1)].add(u)
        return cacc

    timeit("scatter-add (n+1, 8): per bucket", scatter_per_bucket, upds)

    rows_flat = jnp.concatenate([r.reshape(-1) for r in rows_list])
    upd_flat = jnp.concatenate(upds, axis=0)

    @jax.jit
    def scatter_one(u):
        return jnp.zeros((n + 1, 8), jd).at[rows_flat].add(u)

    timeit("scatter-add (n+1, 8): ONE concatenated", scatter_one, upd_flat)

    # phase B pallas launches alone, on pre-gathered planes (current
    # per-bucket chunked launches; includes no gather cost)
    from sphtpu.kernels.pallas_block_pairs import phase_b_blocks

    qf_all = [
        jnp.asarray(
            np.random.default_rng(3).random((sum(nb for _, nb in buckets),
                                             BQ)) + 0.5, jd)
        for _ in range(11)
    ]

    def phase_b_only():
        outs = []
        b0 = 0
        for (C_b, nb), idx in zip(buckets, idx_list):
            qf = tuple(a[b0:b0 + nb] for a in qf_all)
            cf = tuple(fields[i][idx] for i in range(10))
            outs.append(
                phase_b_blocks(
                    qf, cf, md, 1.0, 2.0, None, 0.0,
                    eos="polytropic", p3m=False, cap=BQ,
                )
            )
            b0 += nb
        return outs

    timeit("phase B pallas (launches + per-bucket gathers)",
           jax.jit(phase_b_only))


if __name__ == "__main__":
    main()

"""Sharded tile engine (z-slab + ppermute halos) vs the unsharded engine.

VERDICT r1 item 5: sharded == unsharded using the TILE path at N >= 1e4 on
the 8-virtual-device CPU mesh, per-chip memory independent of total N
(planes span one slab + halo, halo buffers are fixed-budget), certification
freeze on failure. Reference semantics under test: h = r_Kh/2
(polytrope_hydroKDTree.jl:151), symmetric pair scatter (:229-245), softened
gravity with the -(7/5)m/h self term (gravOctree_Single.jl:280-304).
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from scipy.spatial import cKDTree

from sphtpu.engine import EngineConfig, Params, State, make_chunk_runner
from sphtpu.physics.tiles import choose_tile_params
from sphtpu.shard import (
    make_slab_chunk_runner,
    pack_state,
    plan_slabs,
    unpack_rows,
)
from sphtpu.shard.tiles import AXIS

JD = jnp.float64


def _mesh(n_dev=8):
    return Mesh(np.array(jax.devices()[:n_dev]), (AXIS,))


def _sphere_state(n, seed=7, vel_scale=0.05):
    rng = np.random.default_rng(seed)
    u = rng.random((n, 3))
    r = u[:, 0] ** (1 / 3)
    costh = 2 * u[:, 1] - 1
    phi = 2 * np.pi * u[:, 2]
    sinth = np.sqrt(1 - costh**2)
    pos = np.stack(
        [r * sinth * np.cos(phi), r * sinth * np.sin(phi), r * costh], axis=1
    )
    vel = vel_scale * rng.standard_normal((n, 3))
    K = 0.02 + 0.002 * rng.random(n)
    state = State(
        pos=jnp.asarray(pos, JD),
        vel=jnp.asarray(vel, JD),
        K=jnp.asarray(K, JD),
        t=jnp.asarray(0.0, JD),
    )
    return pos, vel, K, state


def _params(t_end=1e9):
    return Params(
        m=jnp.asarray(1.0 / 10000, JD),
        gamma=jnp.asarray(5.0 / 3.0, JD),
        cs0=jnp.asarray(0.08, JD),
        alpha=jnp.asarray(1.0, JD),
        beta=jnp.asarray(2.0, JD),
        U0=jnp.asarray(0.0, JD),
        t_end=jnp.asarray(t_end, JD),
    )


def _h0(pos, kh):
    d_knn, _ = cKDTree(pos).query(pos, k=kh)
    return d_knn[:, -1] / 2.0


def _run_both(n, kh, eos, steps, n_dev=8):
    pos, vel, K, state = _sphere_state(n)
    params = _params()
    h0 = _h0(pos, kh)

    tile = choose_tile_params(pos, h0, kh)
    assert tile is not None
    cfg = EngineConfig(n=n, kh=kh, eos=eos, dtype="float64", tile=tile)
    st1, stats1, valid1, h1, _, nfb1 = make_chunk_runner(cfg)(
        state, params, jnp.asarray(h0, JD), n_steps=steps
    )
    assert int(np.asarray(nfb1).sum()) == 0

    plan = plan_slabs(pos, h0, kh, n_dev)
    assert plan is not None
    cfg_s = EngineConfig(
        n=n, kh=kh, eos=eos, dtype="float64", tile=(plan.grid, plan.cap)
    )
    mesh = _mesh(n_dev)
    chunk_s = make_slab_chunk_runner(cfg_s, plan, mesh)
    sl = pack_state(state, plan, mesh)
    sl2, stats2, valid2, cert2, h2, _ = chunk_s(
        sl, params, jnp.asarray(plan.z0s, jnp.int32), plan.half,
        n_steps=steps,
    )
    assert not bool(np.asarray(cert2).any())
    assert bool(np.asarray(valid2).all())
    return (
        np.asarray(st1.pos),
        np.asarray(stats1),
        np.asarray(h1),
        unpack_rows(np.asarray(sl2.pos), plan, n),
        np.asarray(stats2),
        unpack_rows(np.asarray(h2), plan, n),
        plan,
    )


def test_sharded_tiles_match_unsharded_polytropic():
    """Full KDK chunk, exact gravity: slab-sharded == unsharded tile
    engine at N=1e4 (the VERDICT item-5 bar) to fp64 roundoff."""
    pos_u, stats_u, h_u, pos_s, stats_s, h_s, plan = _run_both(
        10000, 32, "polytropic", 2
    )
    # per-chip plane memory: one slab + halo, not the global grid
    assert plan.lz_max + 2 * plan.halo + 4 < plan.grid + 4
    np.testing.assert_allclose(stats_s, stats_u, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(pos_s, pos_u, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(h_s, h_u, rtol=1e-9, atol=1e-13)


def test_sharded_tiles_match_unsharded_isothermal():
    pos_u, stats_u, h_u, pos_s, stats_s, h_s, _ = _run_both(
        4096, 24, "isothermal", 2, n_dev=4
    )
    np.testing.assert_allclose(stats_s, stats_u, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(pos_s, pos_u, rtol=1e-9, atol=1e-13)


def test_sharded_p3m_matches_softened_oracle():
    """P3M sharded gravity (psum'd mesh + in-tile 5^3 tail) matches the
    exact softened all-pairs oracle at the same force accuracy class as
    the single-chip P3M (tests/test_mesh_gravity.py bounds)."""
    from sphtpu.shard.tiles import make_slab_force_eval

    n, kh = 4096, 24
    pos, vel, K, state = _sphere_state(n)
    params = _params()
    h0 = _h0(pos, kh)
    plan = plan_slabs(pos, h0, kh, 4)
    assert plan is not None
    cfg = EngineConfig(
        n=n, kh=kh, eos="polytropic", dtype="float64",
        tile=(plan.grid, plan.cap), gravity="p3m",
    )
    mesh = _mesh(4)
    ev = make_slab_force_eval(cfg, plan)
    from sphtpu.physics.mesh_gravity import greens_hat
    from sphtpu.shard.tiles import _pad_for
    from jax.sharding import PartitionSpec as P

    ghat = greens_hat(_pad_for(cfg, plan.grid), cfg.sigma_cells, JD)
    sl = pack_state(state, plan, mesh)

    def local(z0s_j, half, pos_l, vel_l, K_l, valid_l):
        acc, aux, ok = ev(params, z0s_j, half, pos_l, vel_l, K_l, valid_l, ghat)
        return acc, aux["phi"], ok

    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS)),
            out_specs=(P(AXIS, None), P(AXIS), P()),
            check_vma=False,
        )
    )
    acc, phi, ok = fn(
        jnp.asarray(plan.z0s, jnp.int32), plan.half,
        sl.pos, sl.vel, sl.K, sl.valid,
    )
    assert bool(np.asarray(ok))
    acc = unpack_rows(np.asarray(acc), plan, n)
    phi = unpack_rows(np.asarray(phi), plan, n)

    # exact softened oracle (acc includes hydro: subtract oracle-hydro via
    # the exact-gravity sharded run instead — here compare phi + total acc
    # against the exact-mode sharded eval, isolating the gravity change)
    cfg_e = dataclasses.replace(cfg, gravity="exact")
    ev_e = make_slab_force_eval(cfg_e, plan)

    def local_e(z0s_j, half, pos_l, vel_l, K_l, valid_l):
        acc, aux, ok = ev_e(params, z0s_j, half, pos_l, vel_l, K_l, valid_l, None)
        return acc, aux["phi"], ok

    fn_e = jax.jit(
        jax.shard_map(
            local_e,
            mesh=mesh,
            in_specs=(P(), P(), P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS)),
            out_specs=(P(AXIS, None), P(AXIS), P()),
            check_vma=False,
        )
    )
    acc_e, phi_e, ok_e = fn_e(
        jnp.asarray(plan.z0s, jnp.int32), plan.half,
        sl.pos, sl.vel, sl.K, sl.valid,
    )
    assert bool(np.asarray(ok_e))
    acc_e = unpack_rows(np.asarray(acc_e), plan, n)
    phi_e = unpack_rows(np.asarray(phi_e), plan, n)

    # RMS relative force error of p3m vs exact softened, against the rms
    # force magnitude (the standard P3M accuracy metric)
    da = np.linalg.norm(acc - acc_e, axis=1)
    f = np.linalg.norm(acc_e, axis=1)
    rms_rel = np.sqrt(np.mean(da**2)) / np.sqrt(np.mean(f**2))
    assert rms_rel < 2e-3, rms_rel
    dphi = np.abs(phi - phi_e) / np.abs(phi_e).max()
    assert dphi.max() < 2e-3, dphi.max()


def test_sharded_cert_fail_freezes_state():
    """An under-budgeted plan must freeze the chunk (no state corruption)
    and report cert_fail, never commit a wrong step."""
    n, kh = 4096, 24
    pos, vel, K, state = _sphere_state(n)
    params = _params()
    h0 = _h0(pos, kh)
    plan = plan_slabs(pos, h0, kh, 4)
    assert plan is not None
    assert plan.budget > 256  # otherwise the "bad" plan below is not bad
    bad = dataclasses.replace(plan, budget=256)  # far below the real need
    cfg = EngineConfig(
        n=n, kh=kh, eos="polytropic", dtype="float64",
        tile=(bad.grid, bad.cap),
    )
    mesh = _mesh(4)
    chunk = make_slab_chunk_runner(cfg, bad, mesh)
    sl = pack_state(state, bad, mesh)
    sl2, stats, valid, cert, h2, _ = chunk(
        sl, params, jnp.asarray(bad.z0s, jnp.int32), bad.half, n_steps=2
    )
    # step 0 fails certification; the chunk then freezes, so later steps
    # are skipped (cont=False) rather than re-failing
    assert bool(np.asarray(cert)[0])
    assert not bool(np.asarray(valid).any())
    np.testing.assert_array_equal(
        np.asarray(sl2.pos), np.asarray(sl.pos)
    )


def test_slab_plan_hysteresis():
    """slab_plan_still_ok (VERDICT r2 weak 7): a compiled slab geometry is
    reused across chunks while the host forecast still certifies, and
    rejected the moment the frozen domain / cell edge / ownership drift /
    halo budgets are violated."""
    from sphtpu.shard.tiles import slab_plan_still_ok

    n, kh = 4096, 24
    pos, vel, K, state = _sphere_state(n)
    h0 = _h0(pos, kh)
    plan = plan_slabs(pos, h0, kh, 4)
    assert plan is not None
    assert slab_plan_still_ok(plan, pos, h0)
    # mild drift: still certifiable (this is the reuse case)
    rng = np.random.default_rng(0)
    drift = pos + 0.05 * np.min(h0) * rng.standard_normal(pos.shape)
    assert slab_plan_still_ok(plan, drift, h0)
    # escape of the frozen domain: rejected
    assert not slab_plan_still_ok(plan, pos * 1.5, h0)
    # h outgrowing the mono-level cell edge: rejected
    assert not slab_plan_still_ok(plan, pos, h0 * 10.0)
    # ownership torn up (rows teleported across slabs): rejected
    flipped = pos.copy()
    flipped[:, 2] = -flipped[:, 2]
    assert not slab_plan_still_ok(plan, flipped, h0)


def test_driver_multichip_end_to_end(tmp_path):
    """VERDICT r1 item 6: the multi-chip path is CLI-reachable — a full
    run_simulation on the 8-device virtual mesh steps through the sharded
    tile engine and writes reference-format snapshots + stats."""
    from sphtpu.engine import run_simulation
    from sphtpu.io import read_snapshot, snapshot_path
    from sphtpu.scenes import iniconds_setup

    root = str(tmp_path)
    iniconds_setup(
        "polytropic", "boss_bodenheimer", root=root, N=20000, Kh=16
    )
    res = run_simulation(
        "polytropic",
        "boss_bodenheimer",
        snap_interval=2,
        keep_snaps=False,
        show_plots=False,
        root=root,
        dtype="float64",
        n_devices=8,
        max_steps=4,
        verbose=False,
    )
    assert res["steps"] == 4
    assert res["sharded_chunks"] >= 1, "slab tile engine never engaged"
    assert res["fallback_evals"] == 0
    assert np.isfinite(res["last_stats_cgs"]).all()
    snap = read_snapshot(
        snapshot_path(root, "boss_bodenheimer", str(res["snapshot_ids"][-1]))
    )
    assert snap["pos"].shape == (20000, 3)
    assert np.isfinite(snap["pos"]).all()
    assert snap["K"] is not None

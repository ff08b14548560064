"""Sharded multi-level engine: strip-sharded work, replicated state.

Why a second distribution strategy next to the z-slab engine
(shard/tiles.py): slabs shard MEMORY well but, under gravitational
collapse, not WORK — balancing slab boundaries by particle count still
parks every dense (high-cap, high-slot-work) cell of the core inside one
chip's slab, so P chips step no faster than one. The multi-level engine's
hot loops are already flat lists of independent strip tiles
(physics/mlevel.py, lax.map over active-(z,x) strips per level) plus a
residual row budget — both embarrassingly shardable. This module keeps
the (small: N x ~12 f32 fields) particle state replicated on every chip,
splits every active list and the residual budget evenly across the mesh,
and psum-combines the per-row outputs: perfect work balance at any
density contrast, one all-reduce per force phase over ICI.

Memory per chip is O(N) (fine through N ~ 1e7 on a 16 GB chip); for the
memory-bound mild-contrast regime the z-slab engine remains the
production path (driver prefers it whenever a slab plan certifies — see
engine/driver.py run_chunk_sharded).

Far field: "exact" shards the pure-Newtonian all-pairs sweep by query
rows (each chip sweeps N/P rows against all N, psum); "p3m" recomputes
the FFT mesh redundantly on every chip — the mesh is N-independent and
small, so replication is cheaper than sharding the FFT + gathering, and
it needs zero collectives.

Certification follows the slab engine's freeze protocol: a failed
collective certificate freezes the chunk (state stops advancing,
cert_fail reported); the host re-plans the spec (plan_mlevel) or
refreshes the traced MLArgs (mlevel_args_still_ok) and resumes — a stale
plan costs a round trip, never physics.

Tests: tests/test_shard_mlevel.py pins sharded == unsharded on the
committed deep-collapse fixture (contrast ~395) on the 8-virtual-device
CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.config import EngineConfig, Params, State
from ..engine.step import _adaptive_dt, _diagnostics
from ..physics import evolve_K
from ..physics.mesh_gravity import greens_hat, p3m_mesh_force
from ..physics.mlevel import MLArgs, mlevel_sph_forces
from .tiles import AXIS


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _newton_rows_sharded(pos, m, n_shards, *, block: int = 2048):
    """Row-sharded pure-Newtonian all-pairs sweep under shard_map: each
    device computes N/n_shards query rows against all N columns, results
    psum into the full (N,) arrays (zeros off-shard). Same pair math as
    physics/gravity.gravity_newton_allpairs."""
    n = pos.shape[0]
    dtype = pos.dtype
    rows_tot = _ceil_to(n, 8 * n_shards)
    rows_per = rows_tot // n_shards
    dev = lax.axis_index(AXIS)

    posp = jnp.pad(pos, ((0, rows_tot - n), (0, 0)))
    q = lax.dynamic_slice(
        posp, (dev * rows_per, jnp.zeros((), dev.dtype)), (rows_per, 3)
    )

    nc = _ceil_to(n, block)
    cx = jnp.pad(pos[:, 0], (0, nc - n))
    cy = jnp.pad(pos[:, 1], (0, nc - n))
    cz = jnp.pad(pos[:, 2], (0, nc - n))

    def col_body(c, carry):
        gx, gy, gz, ph = carry
        dx = q[:, 0:1] - lax.dynamic_slice(cx, (c * block,), (block,))[None, :]
        dy = q[:, 1:2] - lax.dynamic_slice(cy, (c * block,), (block,))[None, :]
        dz = q[:, 2:3] - lax.dynamic_slice(cz, (c * block,), (block,))[None, :]
        cid = c * block + lax.broadcasted_iota(jnp.int32, (1, block), 1)
        r2 = dx * dx + dy * dy + dz * dz
        valid = (cid < n) & (r2 > 0)
        inv_r = jnp.where(valid, lax.rsqrt(jnp.where(r2 > 0, r2, 1.0)), 0.0)
        inv_r3 = inv_r * inv_r * inv_r
        return (
            gx + jnp.sum(inv_r3 * dx, axis=1),
            gy + jnp.sum(inv_r3 * dy, axis=1),
            gz + jnp.sum(inv_r3 * dz, axis=1),
            ph - jnp.sum(inv_r, axis=1),
        )

    zero = jnp.zeros((rows_per,), dtype)
    gx, gy, gz, ph = lax.fori_loop(
        0, nc // block, col_body, (zero, zero, zero, zero)
    )
    gfull = jnp.zeros((rows_tot, 3), dtype)
    gfull = lax.dynamic_update_slice(
        gfull, jnp.stack([gx, gy, gz], axis=1),
        (dev * rows_per, jnp.zeros((), dev.dtype)),
    )
    pfull = lax.dynamic_update_slice(
        jnp.zeros((rows_tot,), dtype), ph, (dev * rows_per,)
    )
    g = lax.psum(gfull, AXIS)[:n]
    phi = lax.psum(pfull, AXIS)[:n]
    return m * g, m * phi


def mlargs_tree(args: MLArgs):
    """MLArgs as a device-ready pytree of jnp arrays (host MLArgs carries
    numpy; shapes are static per spec so refreshing contents does not
    recompile)."""
    return MLArgs(
        act_a=tuple(
            tuple(jnp.asarray(b, jnp.int32) for b in lvl)
            for lvl in args.act_a
        ),
        act_b=tuple(
            tuple(jnp.asarray(b, jnp.int32) for b in lvl)
            for lvl in args.act_b
        ),
        act_c=tuple(jnp.asarray(b, jnp.int32) for b in args.act_c)
        if args.act_c is not None
        else None,
        species=jnp.asarray(args.species, jnp.int32),
    )


def make_ml_chunk_runner(cfg: EngineConfig, mesh: Mesh):
    """Jitted chunk(state, params, h0, mlargs, n_steps) -> (state, stats
    (S,10), valid (S,), cert_fail (S,), h_last, rho_last) running the
    multi-level engine strip-sharded over `mesh`. All inputs/outputs are
    replicated (the collective combines live inside); the compile key is
    (cfg, n_steps) only — MLArgs contents are traced, so a drifting state
    refreshes them without recompiling."""
    assert cfg.mlevel is not None
    n_shards = int(np.prod(mesh.devices.shape))
    # same Pallas phase-A policy as the single-chip dispatch
    # (engine/step.py), with the prestack split across the shards (each
    # device sweeps 1/P of every active list)
    prestack_ml = sum(
        4 * na_b * g * 27 * cb * 4
        for (g, cap, buckets) in cfg.mlevel[0]
        for (cb, na_b, nb_b) in buckets
    ) // n_shards
    use_pallas_ml = (
        cfg.pallas_a
        if cfg.pallas_a is not None
        else jax.default_backend() == "tpu"
        and cfg.dtype == "float32"
        and prestack_ml <= 1.6e9
    )

    def engine_force(p: Params, pos, vel, K, h_hint, mlargs, aux):
        return mlevel_sph_forces(
            pos, vel, p.m, K, h_hint, mlargs,
            eos=cfg.eos, gamma=p.gamma, cs0=p.cs0, alpha=p.alpha,
            beta=p.beta, kh=cfg.kh, spec=cfg.mlevel,
            mesh_factor=cfg.mesh_factor, sigma_cells=cfg.sigma_cells,
            axis=AXIS, n_shards=n_shards, pallas_a=use_pallas_ml,
        )

    return _make_workshard_chunk_runner(cfg, mesh, engine_force)


def _make_workshard_chunk_runner(
    cfg: EngineConfig, mesh: Mesh, engine_force, make_aux=None
):
    """Generic work-sharded chunk runner: replicated state, the engine's
    flat work lists split across the mesh by `engine_force` (which must
    psum its per-row outputs internally), far field row-sharded (exact)
    or replicated (p3m mesh). Shared by the strip-sharded multi-level
    engine and the block-compact engine (shard/blocks.py). make_aux:
    optional per-chunk hook (mlargs -> aux) run once per chunk inside
    shard_map, outside the step scan — the block engine hoists its
    candidate index tables here."""
    n_shards = int(np.prod(mesh.devices.shape))
    p3m = cfg.gravity == "p3m"

    def force(p: Params, pos, vel, K, h_hint, mlargs, ghat, aux):
        tf, gcorr, ok = engine_force(p, pos, vel, K, h_hint, mlargs, aux)
        if p3m:
            gmesh, phim = p3m_mesh_force(
                pos, p.m, ghat, gm=cfg.mesh_gm, pad=cfg.mesh_pad
            )
            g = gmesh + jnp.stack(gcorr[:3], axis=1)
            phi = phim + gcorr[3]
        else:
            gn, phin = _newton_rows_sharded(pos, p.m, n_shards)
            g = gn + jnp.stack(gcorr[:3], axis=1)
            phi = phin + gcorr[3]
        return tf.acc - g, tf, phi, ok

    def step_once(st: State, p: Params, h_hint, mlargs, ghat, aux):
        """One KDK step (engine/step.make_step semantics); returns
        (state', stats, h, rho, ok) — the caller must not commit the step
        when ok is False."""
        pos, vel, K = st.pos, st.vel, st.K
        acc, sf, phi, ok1 = force(p, pos, vel, K, h_hint, mlargs, ghat, aux)
        dt = _adaptive_dt(p, sf, acc, vel)
        vel_r2 = jnp.sum(vel * vel, axis=1)
        stats = _diagnostics(cfg, p, st, sf, phi, vel_r2)

        pos_half = pos + vel * (dt / 2.0)
        vel_half = vel + acc * (dt / 2.0)
        if cfg.eos == "polytropic":
            K = evolve_K(K, sf.visc_dk, p.gamma, sf.rho, dt)
        acc2, sf2, _, ok2 = force(
            p, pos_half, vel_half, K, sf.h, mlargs, ghat, aux
        )
        if cfg.eos == "polytropic":
            K = evolve_K(K, sf2.visc_dk, p.gamma, sf2.rho, dt)
        vel_new = vel + acc2 * dt
        pos_new = pos + vel_new * dt - 0.5 * acc2 * dt**2
        st2 = State(pos_new, vel_new, K, st.t + dt)
        return st2, stats, sf2.h, sf2.rho, ok1 & ok2

    def chunk_local(st, p, h0, mlargs, n_steps):
        dtype = st.pos.dtype
        ghat = (
            greens_hat(cfg.mesh_pad, cfg.sigma_cells, dtype) if p3m else None
        )
        aux = make_aux(mlargs) if make_aux is not None else None

        def body(carry, _):
            stc, alive, h, rho = carry
            cont = alive & (stc.t < p.t_end)

            def do(args):
                s_, h_, rho_ = args
                s2, stats, h2, rho2, ok = step_once(
                    s_, p, h_, mlargs, ghat, aux
                )
                s3 = jax.tree.map(lambda a, b: jnp.where(ok, a, b), s2, s_)
                return (
                    s3, ok, jnp.where(ok, h2, h_), jnp.where(ok, rho2, rho_),
                    stats, ok,
                )

            def skip(args):
                s_, h_, rho_ = args
                return (
                    s_, alive, h_, rho_, jnp.zeros((10,), dtype),
                    jnp.asarray(True),
                )

            s3, alive2, h2, rho2, stats, ok = lax.cond(
                cont, do, skip, (stc, h, rho)
            )
            executed = cont & ok
            cert_fail = cont & ~ok
            return (s3, alive2 & alive, h2, rho2), (stats, executed, cert_fail)

        (st_out, _, h_last, rho_last), (stats, valid, cert) = lax.scan(
            body, (st, jnp.asarray(True), h0, jnp.zeros_like(h0)), None,
            length=n_steps,
        )
        return st_out, stats, valid, cert, h_last, rho_last

    state_specs = State(pos=P(), vel=P(), K=P(), t=P())
    param_specs = jax.tree.map(lambda _: P(), Params(*([0] * len(Params._fields))))

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def chunk(st: State, p: Params, h0, mlargs: MLArgs, n_steps: int):
        mlargs_specs = jax.tree.map(lambda _: P(), mlargs)
        inner = jax.shard_map(
            functools.partial(chunk_local, n_steps=n_steps),
            mesh=mesh,
            in_specs=(state_specs, param_specs, P(), mlargs_specs),
            out_specs=(state_specs, P(), P(), P(), P(), P()),
            check_vma=False,
        )
        return inner(st, p, h0, mlargs)

    return chunk

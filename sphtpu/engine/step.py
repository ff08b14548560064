"""The fused simulation step: force eval + adaptive dt + diagnostics + KDK.

One XLA program per step (two full force evaluations, exactly like the
reference loop polytrope_sim.jl:158-313 / isothermal_sim.jl:152-288),
chunked under lax.scan so `snapInterval` steps run without host round
trips. dt is a data-dependent loop carry; snapshot cadence is step-count
based, so the host slices chunks at snapshot boundaries.

Neighbor engines: when cfg.tile is set, the masked cell-tile fast path
(sphtpu.physics.tiles) runs first and its per-evaluation exactness
certificate gates a lax.cond fallback to the gather engine — a stale grid
costs speed, never correctness. The smoothing lengths ride the scan carry
as the grid-sizing hint for the next evaluation.

Stats row layout matches polytrope_sim.jl:202:
  [t, T, V, U, Etot, com_x, com_y, com_z, |p|, |L|]  (code units here;
  the driver converts to CGS when writing the mmap).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..physics import (
    evolve_K,
    gravity_allpairs,
    gravity_newton_allpairs,
    sph_forces,
)
from ..physics.mesh_gravity import greens_hat, p3m_mesh_force
from ..physics.tiles import ReducedForces, tile_sph_forces
from ..profiling import stage
from .config import EngineConfig, Params, State


def _gather_reduced(cfg: EngineConfig, p: Params, pos, vel, K) -> ReducedForces:
    sf = sph_forces(
        pos,
        vel,
        p.m,
        K,
        eos=cfg.eos,
        gamma=p.gamma,
        cs0=p.cs0,
        alpha=p.alpha,
        beta=p.beta,
        kh=cfg.kh,
    )
    return ReducedForces(
        sf.acc, sf.rho, sf.h, sf.cs, sf.mu_max, sf.div_sum, sf.visc_dk
    )


def force_eval(
    cfg: EngineConfig, p: Params, pos, vel, K, h_hint, ghat=None, mlargs=None,
    aux=None,
):
    """Hydro + gravity acceleration (getAcc, polytrope_sim.jl:17-51).

    Returns (acc, reduced, phi, fell_back). ghat: precomputed Green's
    transform for p3m gravity (computed here if None — callers running
    inside a scan should hoist it via greens_hat()). mlargs: the traced
    per-chunk engine arguments — MLArgs when cfg.mlevel is set, BlockArgs
    when cfg.blocks is set. aux: hoisted per-chunk candidate index tables
    (build_cand_tables) for cfg.blocks — scan callers compute them once
    per chunk; None rebuilds in-call."""
    if cfg.blocks is not None:
        from ..physics.blocks import block_sph_forces

        if mlargs is None:
            raise ValueError("cfg.blocks requires BlockArgs via mlargs")
        p3m = cfg.gravity == "p3m"
        tf, gcorr, ok = block_sph_forces(
            pos,
            vel,
            p.m,
            K,
            h_hint,
            mlargs,
            eos=cfg.eos,
            gamma=p.gamma,
            cs0=p.cs0,
            alpha=p.alpha,
            beta=p.beta,
            kh=cfg.kh,
            spec=cfg.blocks,
            gravity=cfg.gravity,
            mesh_factor=cfg.mesh_factor,
            sigma_cells=cfg.sigma_cells,
            pallas_a=cfg.pallas_a,
            idx_tables=aux,
        )
        if p3m and ghat is None:
            ghat = greens_hat(cfg.mesh_pad, cfg.sigma_cells, pos.dtype)

        def blk_branch():
            if p3m:
                gmesh, phim = p3m_mesh_force(
                    pos, p.m, ghat, gm=cfg.mesh_gm, pad=cfg.mesh_pad
                )
                g = gmesh + jnp.stack(gcorr[:3], axis=1)
                return tf, tf.acc - g, phim + gcorr[3]
            gn, phin = gravity_newton_allpairs(pos, p.m)
            g = gn + jnp.stack(gcorr[:3], axis=1)
            return tf, tf.acc - g, phin + gcorr[3]

        def blk_fallback():
            red = _gather_reduced(cfg, p, pos, vel, K)
            g, phi = gravity_allpairs(pos, red.h, p.m)
            return red, red.acc - g, phi

        if cfg.fallback == "none":
            # failed certs are discarded by make_step; the gather
            # branch never enters the program (see EngineConfig)
            red, acc, phi = blk_branch()
        else:
            red, acc, phi = lax.cond(ok, blk_branch, blk_fallback)
        return acc, red, phi, ~ok

    if cfg.mlevel is not None:
        from ..physics.mlevel import mlevel_sph_forces

        if mlargs is None:
            raise ValueError("cfg.mlevel requires mlargs")
        p3m = cfg.gravity == "p3m"
        # VMEM-resident Pallas phase A per level (pallas_strip_knn.py):
        # prestacks each level's active cells as (cells, 27*cap) rows —
        # 4 fields of f32. Auto policy mirrors the mono tile engine's:
        # TPU backend, f32, total prestack under the measured ~1.6 GB
        # HBM break-even. The query-blocked kernel handles every
        # CAP_MENU capacity.
        prestack_ml = sum(
            4 * na_b * g * 27 * cb * 4
            for (g, cap, buckets) in cfg.mlevel[0]
            for (cb, na_b, nb_b) in buckets
        )
        use_pallas_ml = (
            cfg.pallas_a
            if cfg.pallas_a is not None
            else jax.default_backend() == "tpu"
            and cfg.dtype == "float32"
            and prestack_ml <= 1.6e9
        )
        tf, gcorr, ok = mlevel_sph_forces(
            pos,
            vel,
            p.m,
            K,
            h_hint,
            mlargs,
            eos=cfg.eos,
            gamma=p.gamma,
            cs0=p.cs0,
            alpha=p.alpha,
            beta=p.beta,
            kh=cfg.kh,
            spec=cfg.mlevel,
            mesh_factor=cfg.mesh_factor,
            sigma_cells=cfg.sigma_cells,
            pallas_a=use_pallas_ml,
        )
        if p3m and ghat is None:
            ghat = greens_hat(cfg.mesh_pad, cfg.sigma_cells, pos.dtype)

        def ml_branch():
            if p3m:
                gmesh, phim = p3m_mesh_force(
                    pos, p.m, ghat, gm=cfg.mesh_gm, pad=cfg.mesh_pad
                )
                g = gmesh + jnp.stack(gcorr[:3], axis=1)
                return tf, tf.acc - g, phim + gcorr[3]
            gn, phin = gravity_newton_allpairs(pos, p.m)
            g = gn + jnp.stack(gcorr[:3], axis=1)
            return tf, tf.acc - g, phin + gcorr[3]

        def ml_fallback():
            red = _gather_reduced(cfg, p, pos, vel, K)
            g, phi = gravity_allpairs(pos, red.h, p.m)
            return red, red.acc - g, phi

        if cfg.fallback == "none":
            # failed certs are discarded by make_step; the gather
            # branch never enters the program (see EngineConfig)
            red, acc, phi = ml_branch()
        else:
            red, acc, phi = lax.cond(ok, ml_branch, ml_fallback)
        return acc, red, phi, ~ok

    if cfg.tile is not None and cfg.tile_classes is not None:
        # occupancy-class-compacted tile path (physics/ctiles.py): padded
        # query rows are not swept; candidates stay the full 27-cell
        # prestack so certification equals the mono engine's
        from ..physics.ctiles import ctile_sph_forces

        grid, cap = cfg.tile
        p3m = cfg.gravity == "p3m"
        tf, gcorr, ok = ctile_sph_forces(
            pos,
            vel,
            p.m,
            K,
            h_hint,
            eos=cfg.eos,
            gamma=p.gamma,
            cs0=p.cs0,
            alpha=p.alpha,
            beta=p.beta,
            kh=cfg.kh,
            grid=grid,
            cap=cap,
            classes=cfg.tile_classes,
            mesh_factor=cfg.mesh_factor if p3m else 0,
            sigma_cells=cfg.sigma_cells,
            interpret=jax.default_backend() != "tpu",
        )
        if p3m and ghat is None:
            ghat = greens_hat(cfg.mesh_pad, cfg.sigma_cells, pos.dtype)

        def ctile_branch():
            if p3m:
                gmesh, phim = p3m_mesh_force(
                    pos, p.m, ghat, gm=cfg.mesh_gm, pad=cfg.mesh_pad
                )
                g = gmesh + jnp.stack(gcorr[:3], axis=1)
                return tf, tf.acc - g, phim + gcorr[3]
            gn, phin = gravity_newton_allpairs(pos, p.m)
            g = gn + jnp.stack(gcorr[:3], axis=1)
            return tf, tf.acc - g, phin + gcorr[3]

        def ctile_fallback():
            red = _gather_reduced(cfg, p, pos, vel, K)
            g, phi = gravity_allpairs(pos, red.h, p.m)
            return red, red.acc - g, phi

        if cfg.fallback == "none":
            # failed certs are discarded by make_step; the gather
            # branch never enters the program (see EngineConfig)
            red, acc, phi = ctile_branch()
        else:
            red, acc, phi = lax.cond(ok, ctile_branch, ctile_fallback)
        return acc, red, phi, ~ok

    if cfg.tile is not None:
        grid, cap = cfg.tile
        p3m = cfg.gravity == "p3m"
        # the Pallas phase A pre-stacks 4 fields of (grid^3, 27*cap)
        # candidates in HBM; beyond ~1.6 GB (measured: grid 27/cap 128
        # fits, grid 33/cap 128 OOMs a 16 GB v5e) the HBM savings flip
        # sign, so auto mode falls back to the streaming XLA formulation.
        # The kernel's VMEM working set also scales with cap: cap = 128
        # compiles (measured), cap = 160 exceeds the 16 MB scoped-vmem
        # stack — a PERMANENT compile error, so cap > 128 must never
        # reach the Pallas path.
        prestack_bytes = 4 * grid**3 * 27 * cap * 4
        use_pallas = (
            cfg.pallas_a
            if cfg.pallas_a is not None
            else jax.default_backend() == "tpu"
            and prestack_bytes <= 1.6e9
            and cap <= 128
        )
        tf, gcorr, ok = tile_sph_forces(
            pos,
            vel,
            p.m,
            K,
            h_hint,
            eos=cfg.eos,
            gamma=p.gamma,
            cs0=p.cs0,
            alpha=p.alpha,
            beta=p.beta,
            kh=cfg.kh,
            grid=grid,
            cap=cap,
            mesh_factor=cfg.mesh_factor if p3m else 0,
            sigma_cells=cfg.sigma_cells,
            pallas_a=use_pallas,
            outlier_budget=cfg.outlier_budget,
        )

        if p3m and ghat is None:
            ghat = greens_hat(cfg.mesh_pad, cfg.sigma_cells, pos.dtype)

        def tile_branch():
            if p3m:
                # FFT mesh far field + the tiles' 5^3 (softened -
                # mesh_shape) correction: matched-accuracy replacement for
                # the reference octree (gravOctree_Single.jl:239-278)
                gmesh, phim = p3m_mesh_force(
                    pos, p.m, ghat, gm=cfg.mesh_gm, pad=cfg.mesh_pad
                )
                g = gmesh + jnp.stack(gcorr[:3], axis=1)
                return tf, tf.acc - g, phim + gcorr[3]
            # pure-Newtonian global sweep + the tiles' near-field softening
            # correction == the reference's softened gravity, exactly
            gn, phin = gravity_newton_allpairs(pos, p.m)
            g = gn + jnp.stack(gcorr[:3], axis=1)
            return tf, tf.acc - g, phin + gcorr[3]

        def fallback_branch():
            red = _gather_reduced(cfg, p, pos, vel, K)
            g, phi = gravity_allpairs(pos, red.h, p.m)
            return red, red.acc - g, phi

        if cfg.fallback == "none":
            # failed certs are discarded by make_step; the gather
            # branch never enters the program (see EngineConfig)
            red, acc, phi = tile_branch()
        else:
            red, acc, phi = lax.cond(ok, tile_branch, fallback_branch)
        return acc, red, phi, ~ok

    with stage("hydro_gather"):
        red = _gather_reduced(cfg, p, pos, vel, K)
    with stage("gravity"):
        g, phi = gravity_allpairs(pos, red.h, p.m)
    acc = red.acc - g  # G = 1 in code units (driver applies -G*g)
    return acc, red, phi, jnp.asarray(False)


def _adaptive_dt(p: Params, sf: ReducedForces, acc, vel):
    """4-criterion timestep (polytrope_sim.jl:165-174)."""
    vel_r = jnp.sqrt(jnp.sum(vel * vel, axis=1))
    a_r = jnp.sqrt(jnp.sum(acc * acc, axis=1))
    abs_div_v = jnp.abs(-sf.div_sum / sf.rho)
    c1 = jnp.min(1.0 / abs_div_v)
    c2 = jnp.min(sf.h / vel_r)
    c3 = jnp.min(jnp.sqrt(sf.h / a_r))
    c4 = jnp.min(sf.h / (sf.cs + 1.2 * (p.alpha * sf.cs + p.beta * sf.mu_max)))
    return 0.3 * jnp.minimum(jnp.minimum(c1, c2), jnp.minimum(c3, c4))


def _diagnostics(cfg: EngineConfig, p: Params, state: State, sf, phi, vel_r2):
    """The 10-field stats vector (polytrope_sim.jl:177-202)."""
    pos, vel = state.pos, state.vel
    n = pos.shape[0]
    T = 0.5 * p.m * jnp.sum(vel_r2)
    V = 0.5 * p.m * jnp.sum(phi)  # G = 1
    if cfg.eos == "polytropic":
        U = p.m * jnp.sum(state.K / (p.gamma - 1.0) * sf.rho ** (p.gamma - 1.0))
        Etot = T + V + U
    else:
        U = p.U0
        Etot = T + V + 2.0 * U  # isothermal_sim.jl:177
    r_com = jnp.sum(pos, axis=0) / n
    p_lin = p.m * jnp.sum(vel, axis=0)
    lin_mom = jnp.sqrt(jnp.sum(p_lin**2))
    rel = pos - r_com
    ang = p.m * jnp.sum(jnp.cross(rel, vel), axis=0)
    ang_mom = jnp.sqrt(jnp.sum(ang**2))
    return jnp.stack(
        [state.t, T, V, U, Etot, r_com[0], r_com[1], r_com[2], lin_mom, ang_mom]
    )


def make_step(cfg: EngineConfig):
    """Returns step(state, params, h_hint, ghat=None, mlargs=None) ->
    (state', stats_row, h_new, rho_new, n_fallbacks)."""

    def step(
        state: State, p: Params, h_hint, ghat=None, mlargs=None, aux=None
    ) -> Tuple:
        pos, vel, K = state.pos, state.vel, state.K
        acc, sf, phi, fb1 = force_eval(
            cfg, p, pos, vel, K, h_hint, ghat, mlargs, aux
        )
        dt = _adaptive_dt(p, sf, acc, vel)
        vel_r2 = jnp.sum(vel * vel, axis=1)
        stats = _diagnostics(cfg, p, state, sf, phi, vel_r2)

        # Leapfrog KDK with predictor-corrector (polytrope_sim.jl:208-227)
        pos_half = pos + vel * (dt / 2.0)
        vel_half = vel + acc * (dt / 2.0)
        if cfg.eos == "polytropic":
            K = evolve_K(K, sf.visc_dk, p.gamma, sf.rho, dt)
        acc2, sf2, _, fb2 = force_eval(
            cfg, p, pos_half, vel_half, K, sf.h, ghat, mlargs, aux
        )
        if cfg.eos == "polytropic":
            K = evolve_K(K, sf2.visc_dk, p.gamma, sf2.rho, dt)
        vel_new = vel + acc2 * dt
        pos_new = pos + vel_new * dt - 0.5 * acc2 * dt**2
        n_fb = fb1.astype(jnp.int32) + fb2.astype(jnp.int32)
        if cfg.fallback == "none":
            # a failed certificate means the (uncertified) forces above
            # are not trusted: DISCARD the step — state unchanged, stats
            # zeroed, n_fb tells the caller to replan and re-dispatch.
            # Never wrong physics, exactly like the gather fallback, but
            # without compiling the gather engine into the program.
            keep = n_fb == 0

            def pick(a, b):
                return jnp.where(keep, a, b)

            return (
                State(
                    pick(pos_new, pos), pick(vel_new, vel),
                    pick(K, state.K), jnp.where(keep, state.t + dt, state.t),
                ),
                jnp.where(keep, stats, jnp.zeros_like(stats)),
                pick(sf2.h, h_hint),
                pick(sf2.rho, jnp.zeros_like(sf2.rho)),
                n_fb,
            )
        return (
            State(pos_new, vel_new, K, state.t + dt),
            stats,
            sf2.h,
            sf2.rho,
            n_fb,
        )

    return step


def make_chunk_runner(cfg: EngineConfig):
    """Returns chunk(state, params, h0, n_steps, mlargs=None,
    scan_length=None): runs up to n_steps steps, freezing once t >= t_end.
    Outputs (state, stats (S,10), valid (S,), h_last, rho_last,
    fallbacks (S,)); rho_last is the last half-step density, which the
    driver threads into the snapshot figures (the reference colors its
    star scatter by rho, polytrope_sim.jl:265). mlargs: traced MLArgs for
    cfg.mlevel configs (refreshed per chunk without recompiling).

    scan_length is the STATIC scan shape (S above); n_steps is a TRACED
    active-step count <= scan_length — steps beyond it freeze exactly
    like t >= t_end and report valid=False. Passing a fixed scan_length
    (the driver uses MAX_SCAN_STEPS) means ONE compiled program serves
    every dispatch size, instead of one XLA program — and one slow
    remote-AOT compile — per distinct chunk length (VERDICT r4 next-3:
    the wall-budget probe used to compile a 2-step program per config
    before the full-length one). Default scan_length=None keeps the old
    behavior (static length = n_steps)."""
    step = make_step(cfg)

    @functools.partial(jax.jit, static_argnames=("scan_length",))
    def chunk_impl(
        state: State, p: Params, h0, n_steps, scan_length: int, mlargs=None
    ):
        rho0 = jnp.zeros_like(h0)
        n_active = jnp.asarray(n_steps, jnp.int32)
        # hoisted out of the scan: XLA computes the Green's transform once
        # per chunk, not per force evaluation
        ghat = (
            greens_hat(cfg.mesh_pad, cfg.sigma_cells, h0.dtype)
            if cfg.gravity == "p3m"
            else None
        )
        # also hoisted: the block engine's candidate index tables depend
        # only on the plan (mlargs), not the state — one build per chunk
        aux = None
        if cfg.blocks is not None and mlargs is not None:
            from ..physics.blocks import build_cand_tables

            aux = build_cand_tables(mlargs, cfg.blocks, cfg.n)

        def body(carry, i):
            st, h, rho = carry
            cont = (st.t < p.t_end) & (i < n_active)

            def do(args):
                s, hh, rr = args
                s2, stats, h2, rho2, nfb = step(s, p, hh, ghat, mlargs, aux)
                return (s2, h2, rho2), stats, nfb

            def skip(args):
                s, hh, rr = args
                return (s, hh, rr), jnp.zeros((10,), s.pos.dtype), jnp.int32(0)

            carry2, stats, nfb = lax.cond(cont, do, skip, (st, h, rho))
            return carry2, (stats, cont, nfb)

        (state_out, h_last, rho_last), (stats, valid, nfb) = lax.scan(
            body, (state, h0, rho0), jnp.arange(scan_length), length=scan_length
        )
        return state_out, stats, valid, h_last, rho_last, nfb

    def chunk(state, p, h0, n_steps, mlargs=None, *, scan_length=None):
        if scan_length is None:
            scan_length = int(n_steps)
        if int(n_steps) > scan_length:
            raise ValueError(f"n_steps {n_steps} > scan_length {scan_length}")
        return chunk_impl(state, p, h0, n_steps, scan_length, mlargs)

    return chunk

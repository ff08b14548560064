"""The fused simulation step: force eval + adaptive dt + diagnostics + KDK.

One XLA program per step (two full force evaluations, exactly like the
reference loop polytrope_sim.jl:158-313 / isothermal_sim.jl:152-288),
chunked under lax.scan so `snapInterval` steps run without host round
trips. dt is a data-dependent loop carry; snapshot cadence is step-count
based, so the host slices chunks at snapshot boundaries.

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

from ..physics import evolve_K, gravity_allpairs, sph_forces
from .config import EngineConfig, Params, State


def force_eval(cfg: EngineConfig, p: Params, pos, vel, K):
    """Hydro + gravity acceleration (getAcc, polytrope_sim.jl:17-51)."""
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
    g, phi = gravity_allpairs(pos, sf.h, p.m)
    acc = sf.acc - g  # G = 1 in code units (driver applies -G*g)
    return acc, sf, phi


def _adaptive_dt(p: Params, sf, acc, vel):
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
    """Returns step(state, params) -> (state', stats_row)."""

    def step(state: State, p: Params) -> Tuple[State, jnp.ndarray]:
        pos, vel, K = state.pos, state.vel, state.K
        acc, sf, phi = force_eval(cfg, p, pos, vel, K)
        dt = _adaptive_dt(p, sf, acc, vel)
        vel_r2 = jnp.sum(vel * vel, axis=1)
        stats = _diagnostics(cfg, p, state, sf, phi, vel_r2)

        # Leapfrog KDK with predictor-corrector (polytrope_sim.jl:208-227)
        pos_half = pos + vel * (dt / 2.0)
        vel_half = vel + acc * (dt / 2.0)
        if cfg.eos == "polytropic":
            K = evolve_K(K, sf.visc_dk, p.gamma, sf.rho, dt)
        acc2, sf2, _ = force_eval(cfg, p, pos_half, vel_half, K)
        if cfg.eos == "polytropic":
            K = evolve_K(K, sf2.visc_dk, p.gamma, sf2.rho, dt)
        vel_new = vel + acc2 * dt
        pos_new = pos + vel_new * dt - 0.5 * acc2 * dt**2
        return State(pos_new, vel_new, K, state.t + dt), stats

    return step


def make_chunk_runner(cfg: EngineConfig):
    """Returns chunk(state, params, n_steps) jitted with static n_steps:
    runs up to n_steps steps, freezing once t >= t_end. Output stats rows
    carry a validity flag so the host records only executed steps."""
    step = make_step(cfg)

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def chunk(state: State, p: Params, n_steps: int):
        def body(st, _):
            cont = st.t < p.t_end

            def do(s):
                return step(s, p)

            def skip(s):
                return s, jnp.zeros((10,), st.pos.dtype)

            st_out, stats = lax.cond(cont, do, skip, st)
            return st_out, (stats, cont)

        state_out, (stats, valid) = lax.scan(body, state, None, length=n_steps)
        return state_out, stats, valid

    return chunk

"""Multi-chip particle-sharded simulation step (shard_map over a Mesh).

NOTE: this is the REFERENCE formulation of the distributed layer — simple,
always-correct, O(N) per-chip memory via all_gather. The production
multi-chip path is the sharded tile engine (shard/tiles.py: z-slab
decomposition + ppermute halo exchange), which the driver uses for
--n-devices runs; this module remains as its correctness oracle and the
fallback formulation.

The reference is single-process with a shared-memory KD-tree/octree
(SURVEY.md §2 parallelism checklist: no distributed backend exists there).
The TPU-native replacement shards the particle axis over a 1-D device mesh
("dp") and uses XLA collectives over ICI:

  - `all_gather`   : candidate positions/velocities/h/rho for neighbor
                     search and the gravity column sweep (every chip scans
                     all candidates but only owns N/P query rows)
  - `psum_scatter` : reduction of the symmetric pair-force scatter — each
                     chip accumulates its contributions to *global* slots,
                     and the reduce-scatter hands every chip the summed
                     block it owns (one fused collective, rides ICI)
  - `psum` / `pmin`: replicated diagnostics and the global adaptive dt

Physics formulas are identical to the single-device engine
(sphtpu.engine.step); tests assert sharded == unsharded to float tolerance.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.config import EngineConfig, Params, State
from ..kernels import W, grad_W_over_r
from ..neighbors import knn
from ..physics.gravity import gravity_sweep

AXIS = "dp"


def particle_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name "dp"."""
    devices = jax.devices() if devices is None else devices
    import numpy as np

    return Mesh(np.array(devices), (AXIS,))


def _local_force_eval(cfg: EngineConfig, p: Params, pos_l, vel_l, K_l, row0):
    """Force evaluation for the local row block against the global set."""
    n_local = pos_l.shape[0]
    pos_g = lax.all_gather(pos_l, AXIS, tiled=True)  # (N, 3)
    vel_g = lax.all_gather(vel_l, AXIS, tiled=True)

    idx, _ = knn(pos_l, pos_g, cfg.kh)  # (nl, K) global indices
    # planar (nl, K) separation planes (trailing-3 layouts lane-pad on TPU)
    dx = pos_l[:, 0:1] - pos_g[:, 0][idx]
    dy = pos_l[:, 1:2] - pos_g[:, 1][idx]
    dz = pos_l[:, 2:3] - pos_g[:, 2][idx]
    r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    h_l = jnp.max(r, axis=1) / 2.0
    hcol = h_l[:, None]
    q = r / hcol
    w = W(q, hcol)
    rho_l = p.m * jnp.sum(w, axis=1)

    h_g = lax.all_gather(h_l, AXIS, tiled=True)
    rho_g = lax.all_gather(rho_l, AXIS, tiled=True)

    if cfg.eos == "polytropic":
        K_g = lax.all_gather(K_l, AXIS, tiled=True)
        cs_l = jnp.sqrt(p.gamma * K_l * rho_l ** (p.gamma - 1.0))
        por2_g = K_g * rho_g ** (p.gamma - 2.0)  # P/rho^2 = K rho^(g-2)
        por2_l = K_l * rho_l ** (p.gamma - 2.0)
    else:
        cs_l = jnp.broadcast_to(jnp.asarray(p.cs0, pos_l.dtype), rho_l.shape)
        por2_g = p.cs0**2 / rho_g
        por2_l = p.cs0**2 / rho_l

    gid = row0 + jax.lax.broadcasted_iota(jnp.int32, (n_local, 1), 0).squeeze(-1)
    self_mask = idx == gid[:, None]

    h_avg = 0.5 * (hcol + h_g[idx])
    rho_avg = 0.5 * (rho_l[:, None] + rho_g[idx])
    vij_x = vel_l[:, 0:1] - vel_g[:, 0][idx]
    vij_y = vel_l[:, 1:2] - vel_g[:, 1][idx]
    vij_z = vel_l[:, 2:3] - vel_g[:, 2][idx]
    v_dot_r = vij_x * dx + vij_y * dy + vij_z * dz
    mu = jnp.minimum(h_avg * v_dot_r / (r * r + 0.01 * h_avg**2), 0.0)
    Pi = (-p.alpha * cs_l[:, None] * mu + p.beta * mu**2) / rho_avg

    dWdr = grad_W_over_r(q, r, hcol)

    if cfg.eos == "polytropic":
        ct = p.m * (por2_l[:, None] + por2_g[idx] + Pi) / 2.0
    else:
        ct = p.m * (por2_l[:, None] + Pi / 2.0)
    ct = jnp.where(self_mask, 0.0, ct)

    n_global = pos_g.shape[0]
    flat_idx = idx.reshape(-1)
    coeff = ct * dWdr
    acc_axes = []
    for dax in (dx, dy, dz):
        contrib = coeff * dax
        a = -jnp.sum(contrib, axis=1)
        buf = jnp.zeros((n_global,), pos_l.dtype).at[flat_idx].add(
            contrib.reshape(-1)
        )
        acc_axes.append(
            a + lax.psum_scatter(buf, AXIS, scatter_dimension=0, tiled=True)
        )
    acc_l = jnp.stack(acc_axes, axis=1)

    # gravity: local rows against the gathered global column set
    g, phi = gravity_sweep(pos_l, h_l, gid, pos_g, h_g)
    acc_l = acc_l - p.m * g  # G = 1
    phi_l = p.m * phi - p.m * 1.4 / h_l

    v_dot_dW = v_dot_r * dWdr
    # reduced per-particle sums; the evolve_K pair sum reduce-scatters its
    # remote contributions just like the pair force does
    ct_k = jnp.where(self_mask, 0.0, p.m * Pi * v_dot_dW / 2.0)
    dk_l = jnp.sum(ct_k, axis=1)
    kbuf = jnp.zeros((n_global,), pos_l.dtype)
    kbuf = kbuf.at[idx.reshape(-1)].add(ct_k.reshape(-1))
    dk_l = dk_l + lax.psum_scatter(kbuf, AXIS, scatter_dimension=0, tiled=True)

    return acc_l, dict(
        rho=rho_l,
        h=h_l,
        cs=cs_l,
        mu_max=jnp.max(mu, axis=1),
        div_sum=jnp.sum(p.m * v_dot_dW, axis=1),
        visc_dk=dk_l,
        phi=phi_l,
    )


def make_sharded_step(cfg: EngineConfig, mesh: Mesh):
    """Step on local blocks; call under shard_map (see chunk runner)."""
    n_dev = mesh.shape[AXIS]
    if cfg.n % n_dev:
        raise ValueError(f"N={cfg.n} not divisible by mesh size {n_dev}")
    n_local = cfg.n // n_dev

    def step(state: State, p: Params) -> Tuple[State, jnp.ndarray]:
        pos_l, vel_l, K_l = state.pos, state.vel, state.K
        row0 = lax.axis_index(AXIS) * n_local
        acc, aux = _local_force_eval(cfg, p, pos_l, vel_l, K_l, row0)

        # ---- adaptive dt (global min over the mesh) ----
        vel_r2 = jnp.sum(vel_l * vel_l, axis=1)
        a_r = jnp.sqrt(jnp.sum(acc * acc, axis=1))
        abs_div_v = jnp.abs(-aux["div_sum"] / aux["rho"])
        mu_max = aux["mu_max"]
        local_min = jnp.minimum(
            jnp.minimum(jnp.min(1.0 / abs_div_v), jnp.min(aux["h"] / jnp.sqrt(vel_r2))),
            jnp.minimum(
                jnp.min(jnp.sqrt(aux["h"] / a_r)),
                jnp.min(
                    aux["h"]
                    / (aux["cs"] + 1.2 * (p.alpha * aux["cs"] + p.beta * mu_max))
                ),
            ),
        )
        dt = 0.3 * lax.pmin(local_min, AXIS)

        # ---- diagnostics (psum -> replicated stats row) ----
        T = 0.5 * p.m * lax.psum(jnp.sum(vel_r2), AXIS)
        V = 0.5 * p.m * lax.psum(jnp.sum(aux["phi"]), AXIS)
        if cfg.eos == "polytropic":
            U = p.m * lax.psum(
                jnp.sum(K_l / (p.gamma - 1.0) * aux["rho"] ** (p.gamma - 1.0)), AXIS
            )
            Etot = T + V + U
        else:
            U = p.U0
            Etot = T + V + 2.0 * U
        r_com = lax.psum(jnp.sum(pos_l, axis=0), AXIS) / cfg.n
        p_lin = p.m * lax.psum(jnp.sum(vel_l, axis=0), AXIS)
        lin_mom = jnp.sqrt(jnp.sum(p_lin**2))
        ang = p.m * lax.psum(jnp.sum(jnp.cross(pos_l - r_com, vel_l), axis=0), AXIS)
        ang_mom = jnp.sqrt(jnp.sum(ang**2))
        stats = jnp.stack(
            [state.t, T, V, U, Etot, r_com[0], r_com[1], r_com[2], lin_mom, ang_mom]
        )

        # ---- KDK ----
        pos_half = pos_l + vel_l * (dt / 2.0)
        vel_half = vel_l + acc * (dt / 2.0)
        if cfg.eos == "polytropic":
            K_l = K_l + (
                0.5
                * (p.gamma - 1.0)
                / aux["rho"] ** (p.gamma - 1.0)
                * aux["visc_dk"]
            ) * (dt / 2.0)
        acc2, aux2 = _local_force_eval(cfg, p, pos_half, vel_half, K_l, row0)
        if cfg.eos == "polytropic":
            K_l = K_l + (
                0.5
                * (p.gamma - 1.0)
                / aux2["rho"] ** (p.gamma - 1.0)
                * aux2["visc_dk"]
            ) * (dt / 2.0)
        vel_new = vel_l + acc2 * dt
        pos_new = pos_l + vel_new * dt - 0.5 * acc2 * dt**2
        return State(pos_new, vel_new, K_l, state.t + dt), stats

    return step


def make_sharded_chunk_runner(cfg: EngineConfig, mesh: Mesh):
    """Jitted chunk(state, params, n_steps) with state sharded over "dp".

    State arrays may be passed as host/global arrays; out state keeps the
    row-sharded layout. Stats/valid come back replicated.
    """
    step = make_sharded_step(cfg, mesh)

    state_specs = State(
        pos=P(AXIS, None), vel=P(AXIS, None), K=P(AXIS), t=P()
    )
    param_specs = jax.tree.map(lambda _: P(), Params(*([0] * len(Params._fields))))

    def chunk_local(state, p, n_steps):
        def body(st, _):
            cont = st.t < p.t_end
            st_out, stats = lax.cond(
                cont,
                lambda s: step(s, p),
                lambda s: (s, jnp.zeros((10,), s.pos.dtype)),
                st,
            )
            return st_out, (stats, cont)

        state_out, (stats, valid) = lax.scan(body, state, None, length=n_steps)
        return state_out, stats, valid

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def chunk(state: State, p: Params, n_steps: int):
        inner = jax.shard_map(
            functools.partial(chunk_local, n_steps=n_steps),
            mesh=mesh,
            in_specs=(state_specs, param_specs),
            out_specs=(state_specs, P(), P()),
            check_vma=False,
        )
        return inner(state, p)

    return chunk


def shard_state(state: State, mesh: Mesh) -> State:
    """Place a host-built State with the row-sharded layout."""
    specs = State(pos=P(AXIS, None), vel=P(AXIS, None), K=P(AXIS), t=P())
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )

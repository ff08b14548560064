"""Subprocess worker for the multi-host tests (tests/test_multihost.py).

Each worker is one `jax.distributed` process with 4 virtual CPU devices;
two of them form the 2-process x 4-device global mesh the multi-host
layer (sphtpu/shard/multihost.py) is tested on. Importable without
side effects — jax configuration happens in main() from env vars the
parent test sets (JAX_PLATFORMS=cpu, device-count XLA flag, x64).

Modes:
  force   one work-sharded block-engine chunk (2 KDK steps) over the
          global mesh; dumps the resulting state/stats to <out>/p<id>.npz
  driver  end-to-end run_simulation(multihost=True) from a snapshot tree
          the parent prepared; dumps the summary (steps, snapshot ids,
          last stats row) to <out>/p<id>.npz
"""

from __future__ import annotations

import sys

import numpy as np
from scipy.spatial import cKDTree

KH = 16


def fixture(n=768, seed=7):
    """Deterministic two-scale blob (shared by workers and the parent's
    single-process reference)."""
    rng = np.random.default_rng(seed)
    n_core = int(0.5 * n)

    def ball(count, radius):
        u = rng.random(count) ** (1 / 3)
        d = rng.standard_normal((count, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return d * (radius * u)[:, None]

    pos = np.concatenate([ball(n_core, 0.3), ball(n - n_core, 1.0)])
    vel = 0.1 * rng.standard_normal((n, 3))
    K = 1.0 + 0.1 * rng.random(n)
    d, _ = cKDTree(pos).query(pos, k=KH)
    return pos, vel, K, d[:, -1] / 2.0


def run_force_chunk(mesh, n_steps=2):
    """The work-sharded blocks chunk on the fixture over `mesh` (global
    or single-process — same code path either way). Returns host numpy
    (pos, vel, K, t, stats)."""
    import jax.numpy as jnp

    from sphtpu.engine import EngineConfig, Params, State
    from sphtpu.physics.blocks import plan_blocks
    from sphtpu.shard import multihost as mh
    from sphtpu.shard.blocks import blockargs_tree, make_blocks_chunk_runner

    pos, vel, K, h0 = fixture()
    n = pos.shape[0]
    n_dev = int(np.prod(mesh.devices.shape))
    res = plan_blocks(pos, h0, KH, gravity="exact", shards=n_dev)
    assert res is not None
    spec, args = res
    cfg = EngineConfig(
        n=n, kh=KH, eos="polytropic", dtype="float64", blocks=spec,
        gravity="exact",
    )
    jd = jnp.float64
    p = Params(
        m=jnp.asarray(1.0 / n, jd), gamma=jnp.asarray(5 / 3, jd),
        cs0=jnp.asarray(0.0, jd), alpha=jnp.asarray(1.0, jd),
        beta=jnp.asarray(2.0, jd), U0=jnp.asarray(0.0, jd),
        t_end=jnp.asarray(1e9, jd),
    )
    st = State(
        pos=jnp.asarray(pos, jd), vel=jnp.asarray(vel, jd),
        K=jnp.asarray(K, jd), t=jnp.asarray(0.0, jd),
    )
    chunk = make_blocks_chunk_runner(cfg, mesh)
    inputs = (st, p, jnp.asarray(h0, jd), blockargs_tree(args))
    with mesh:
        st2, stats, valid, cert, h_l, rho_l = chunk(
            *(mh.replicate(x, mesh) for x in inputs), n_steps=n_steps
        )
    assert bool(mh.host_local(valid).all()), "steps must execute"
    assert not bool(mh.host_local(cert).any()), "no cert failures expected"
    return (
        mh.host_local(st2.pos), mh.host_local(st2.vel),
        mh.host_local(st2.K), mh.host_local(st2.t), mh.host_local(stats),
    )


def main():
    pid = int(sys.argv[1])
    n_procs = int(sys.argv[2])
    port = int(sys.argv[3])
    out = sys.argv[4]
    mode = sys.argv[5]
    root = sys.argv[6] if len(sys.argv) > 6 else None

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from sphtpu.shard import multihost as mh

    mh.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_procs,
        process_id=pid,
    )
    assert jax.process_count() == n_procs
    assert len(jax.devices()) == 4 * n_procs, len(jax.devices())

    if mode == "force":
        mesh = mh.global_mesh()
        pos, vel, K, t, stats = run_force_chunk(mesh)
        np.savez(
            f"{out}/p{pid}.npz", pos=pos, vel=vel, K=K, t=t, stats=stats,
            primary=mh.is_primary(),
        )
    elif mode == "driver":
        from sphtpu.engine import run_simulation

        summary = run_simulation(
            "polytropic", "gaussian_sphere", snap_id=1, snap_interval=2,
            keep_snaps=True, show_plots=False, root=root, dtype="float64",
            multihost=True, max_steps=4, verbose=False,
        )
        np.savez(
            f"{out}/p{pid}.npz",
            steps=summary["steps"],
            snapshot_ids=np.asarray(summary["snapshot_ids"], np.int64),
            last_stats=summary["last_stats_cgs"],
            pos=np.asarray(summary["state"].pos, np.float64),
            primary=mh.is_primary(),
        )
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()

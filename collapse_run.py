"""Deep-collapse driver: cold Boss-Bodenheimer, N=2e5, f32 TPU.

Drives the production engine (per-chunk grid re-planning, tile fast path
with outlier lane, P3M or exact gravity) deep into gravitational collapse,
logging density contrast / fallbacks / energy per chunk and saving npz
checkpoints for the hard-regime bench and conservation analysis.

Usage: python collapse_run.py [N] [T_kelvin] [max_steps] [out_prefix]
"""

import json
import os
import sys
import time

import numpy as np

import jax

# honor an explicit cpu request despite the baked axon registration
# (same dance as __graft_entry__.py)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
if os.environ.get("COLLAPSE_DTYPE") == "float64":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
T_K = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
MAX_STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4000
PREFIX = sys.argv[4] if len(sys.argv) > 4 else "collapse_r2"
KH = 50
CHUNK = int(os.environ.get('COLLAPSE_CHUNK', 4))
T_END_CODE = 1.35  # ~1.2 free-fall times of the uniform cloud
WALL_LIMIT_S = float(os.environ.get("WALL_LIMIT_S", 99000))
DTYPE = os.environ.get("COLLAPSE_DTYPE", "float32")


def main():
    from scipy.spatial import cKDTree

    from sphtpu import constants as C
    from sphtpu.engine import EngineConfig, Params, State, make_chunk_runner
    from sphtpu.engine.driver import P3M_MIN_N
    from sphtpu.physics.tiles import (
        choose_tile_params_ml,
        tile_params_still_ok,
    )
    from sphtpu.scenes.generators import boss_bodenheimer
    from sphtpu.scenes.setup import DEFAULTS
    from sphtpu.units import UnitSystem

    rng = np.random.default_rng(42)
    R = DEFAULTS["R"]
    M = DEFAULTS["M"]
    pos, vel, rho_vec = boss_bodenheimer(N, R, M, rng=rng)
    gamma = DEFAULTS["gamma"]
    K_cgs = C.KB * T_K / (DEFAULTS["mu"] * C.MH * rho_vec[0] ** (gamma - 1.0))
    u = UnitSystem.from_constants(C.G_CGS, M, R)
    jd = jnp.dtype(DTYPE)

    pos_code = pos / u.L
    d_knn, _ = cKDTree(pos_code).query(pos_code, k=KH)
    h_host = d_knn[:, -1] / 2.0

    params = Params(
        m=jnp.asarray(M / N / u.M, jd),
        gamma=jnp.asarray(gamma, jd),
        cs0=jnp.asarray(0.0, jd),
        alpha=jnp.asarray(DEFAULTS["alpha"], jd),
        beta=jnp.asarray(DEFAULTS["beta"], jd),
        U0=jnp.asarray(0.0, jd),
        t_end=jnp.asarray(T_END_CODE, jd),
    )
    state = State(
        pos=jnp.asarray(pos_code, jd),
        vel=jnp.asarray(vel / u.V, jd),
        K=jnp.asarray(np.full(N, K_cgs) / u.K_entropy(gamma), jd),
        t=jnp.asarray(0.0, jd),
    )
    start_steps = 0
    if os.environ.get("RESUME") == "1":
        import glob

        cks = sorted(glob.glob(f"{PREFIX}_ckpt/step*.npz"))
        if cks:
            d = np.load(cks[-1])
            state = State(
                pos=jnp.asarray(d["pos"], jd),
                vel=jnp.asarray(d["vel"], jd),
                K=jnp.asarray(d["K"], jd),
                t=jnp.asarray(float(d["t"]), jd),
            )
            h_host = np.asarray(d["h"], np.float64)
            start_steps = int(cks[-1].split("step")[-1].split(".")[0])
            print(f"resumed from {cks[-1]} at step {start_steps}", flush=True)
    h_dev = jnp.asarray(h_host, jd)

    runners = {}
    # monotonically increasing count of chunk-runner constructions: unlike
    # len(runners) it survives the crash-retry loop's runners.clear(), so
    # fresh_compile / n_programs below report every XLA program actually
    # paid for, including retry recompiles (ADVICE r4)
    n_compiles = [0]

    def get_runner(cfg):
        if cfg not in runners:
            runners[cfg] = make_chunk_runner(cfg)
            n_compiles[0] += 1
        return runners[cfg]

    log = open(f"{PREFIX}_log.jsonl", "a", buffering=1)
    os.makedirs(f"{PREFIX}_ckpt", exist_ok=True)
    t0_wall = time.time()
    cfg = None
    total_steps = start_steps
    total_fb = 0
    E0 = None
    next_ckpt = start_steps

    while total_steps < MAX_STEPS and time.time() - t0_wall < WALL_LIMIT_S:
        # host copy of the pre-chunk state: crash-retry restart point
        pos_ckpt = np.asarray(state.pos)
        vel_ckpt = np.asarray(state.vel)
        K_ckpt = np.asarray(state.K)
        t_ckpt = float(np.asarray(state.t))
        grav = "p3m" if N >= P3M_MIN_N else "exact"
        eargs = None
        fresh_plan = False  # set when hysteresis misses and we re-plan
        if os.environ.get("COLLAPSE_ENGINE") == "gather":
            # single always-exact program: right for small-N CPU lanes
            cfg = EngineConfig(n=N, kh=KH, eos="polytropic", dtype=DTYPE)
        else:
            # compile-aware hysteresis, mirroring the production driver's
            # pick_cfg (engine/driver.py): prefer any already-compiled
            # config that still certifies; plan fresh when none do —
            # mono tiles for uniform states, the block-compact engine
            # under contrast, outlier-lane tiles as the last resort
            from sphtpu.physics.blocks import (
                block_args_for_spec,
                plan_blocks,
            )
            from sphtpu.physics.tiles import choose_tile_params

            def cfg_cost(c):
                if c.tile is not None:
                    return (
                        c.tile[0] ** 3 * float(c.tile[1]) ** 2 * 27.0
                        + N * float(c.outlier_budget)
                    )
                from sphtpu.physics.blocks import BQ

                return 13.0 * sum(cb * nb * BQ for cb, nb in c.blocks[0])

            cached = []
            for c in runners:
                if c.tile is not None and tile_params_still_ok(
                    pos_ckpt, h_host, c.tile[0], c.tile[1], c.outlier_budget
                ):
                    cached.append((c, None))
                elif c.blocks is not None:
                    a = block_args_for_spec(
                        pos_ckpt, h_host, c.blocks, gravity=c.gravity
                    )
                    if a is not None:
                        cached.append((c, a))
            if cached:
                cfg, eargs = min(cached, key=lambda ca: cfg_cost(ca[0]))
            else:
                fresh_plan = True
                tp_mono = choose_tile_params(
                    pos_ckpt, h_host, KH, headroom=1.5
                )
                blk = None if tp_mono is not None else plan_blocks(
                    pos_ckpt, h_host, KH, gravity=grav
                )
                if tp_mono is not None:
                    cfg = EngineConfig(
                        n=N, kh=KH, eos="polytropic", dtype=DTYPE,
                        tile=tp_mono, gravity=grav,
                    )
                elif blk is not None:
                    spec, eargs = blk
                    cfg = EngineConfig(
                        n=N, kh=KH, eos="polytropic", dtype=DTYPE,
                        blocks=spec, gravity=grav,
                    )
                else:
                    tp = choose_tile_params_ml(
                        pos_ckpt, h_host, KH, headroom=1.5,
                        budget_margin=2.0,
                    )
                    if tp is None:
                        cfg = EngineConfig(
                            n=N, kh=KH, eos="polytropic", dtype=DTYPE
                        )
                    else:
                        grid, cap, budget = tp
                        cfg = EngineConfig(
                            n=N, kh=KH, eos="polytropic", dtype=DTYPE,
                            tile=(grid, cap), gravity=grav,
                            outlier_budget=budget,
                        )
        compiles_before = n_compiles[0]
        chunk = get_runner(cfg)
        tw = time.time()
        # the axon TPU worker occasionally crashes/restarts mid-compile;
        # state is only committed after a successful host fetch, so a
        # retry recompiles and reruns the same chunk
        for attempt in range(4):
            try:
                state2, stats, valid, h_dev2, rho_dev, nfb = chunk(
                    state, params, h_dev,
                    # traced boxes drift with the state: blocks configs
                    # run short sub-chunks with a host refresh between
                    # (the hysteresis lookup above IS the refresh)
                    n_steps=min(CHUNK, 2) if cfg.blocks is not None else CHUNK,
                    mlargs=eargs,
                    # one compiled program per config for every dispatch
                    # size (n_steps is traced; the scan shape is fixed)
                    scan_length=CHUNK,
                )
                h_host = np.asarray(h_dev2, np.float64)
                rho = np.asarray(rho_dev, np.float64)
                stats = np.asarray(stats, np.float64)
                valid = np.asarray(valid)
                state = state2
                h_dev = h_dev2
                break
            except Exception as e:  # noqa: BLE001
                print(f"chunk failed (attempt {attempt}): {e!r}", flush=True)
                runners.clear()
                time.sleep(120)
                # state/h_dev device handles may be dead: rebuild from host
                state = State(
                    jnp.asarray(np.asarray(pos_ckpt), jd),
                    jnp.asarray(np.asarray(vel_ckpt), jd),
                    jnp.asarray(np.asarray(K_ckpt), jd),
                    jnp.asarray(t_ckpt, jd),
                )
                h_dev = jnp.asarray(h_host, jd)
                chunk = get_runner(cfg)
        else:
            raise RuntimeError("chunk failed 4 times")
        wall = time.time() - tw
        nv = int(valid.sum())
        if nv == 0:
            print("t_end reached")
            break
        n_fb = int(np.asarray(nfb).sum())
        total_fb += n_fb
        total_steps += nv
        last = stats[nv - 1]
        if E0 is None:
            E0 = stats[0][4]
        if not np.isfinite(last).all() or not np.isfinite(rho).all():
            print("NON-FINITE STATE", last)
            break
        rec = {
            "steps": total_steps,
            "t": float(np.asarray(state.t)),
            "dt_last": float(last[0] - stats[max(nv - 2, 0)][0]) if nv > 1 else None,
            "wall_s": round(wall, 2),
            "ps_per_s": round(N * nv / wall, 1),
            "fallbacks": n_fb,
            "tile": list(cfg.tile) if cfg.tile else None,
            "budget": cfg.outlier_budget,
            "rho_max": float(rho.max()),
            "contrast": float(rho.max() / max(rho.min(), 1e-30)),
            "h_ratio": float(h_host.max() / h_host.min()),
            "E": float(last[4]),
            "dE_rel": float((last[4] - E0) / abs(E0)),
            "ang": float(last[9]),
            # replan/compile accounting (VERDICT r3 next-2 evidence):
            # fresh_plan = hysteresis+refit missed and the host re-planned;
            # fresh_compile = this chunk paid >=1 new XLA program (counted
            # AFTER the crash-retry loop, so retry recompiles after
            # runners.clear() are included — ADVICE r4);
            # n_programs = total runner compiles so far (monotonic)
            "fresh_plan": fresh_plan,
            "fresh_compile": n_compiles[0] > compiles_before,
            "n_programs": n_compiles[0],
        }
        log.write(json.dumps(rec) + "\n")
        if total_steps >= next_ckpt:
            np.savez(
                f"{PREFIX}_ckpt/step{total_steps:06d}.npz",
                pos=np.asarray(state.pos, np.float64),
                vel=np.asarray(state.vel, np.float64),
                K=np.asarray(state.K, np.float64),
                t=float(np.asarray(state.t)),
                h=h_host,
                stats_last=last,
                E0=E0,
            )
            next_ckpt = total_steps + 20
    np.savez(
        f"{PREFIX}_ckpt/final.npz",
        pos=np.asarray(state.pos, np.float64),
        vel=np.asarray(state.vel, np.float64),
        K=np.asarray(state.K, np.float64),
        t=float(np.asarray(state.t)),
        h=h_host,
        E0=E0,
    )
    print("done:", total_steps, "steps,", total_fb, "fallbacks")


if __name__ == "__main__":
    main()

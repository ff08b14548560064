"""N=1e7 single-chip scale lane (VERDICT r4 next-7).

One order of magnitude past the round-3 stretch (N=2e6): step a uniform
sphere AND a mild-contrast gaussian sphere at N=1e7 on one chip with the
production tile engine + P3M gravity, under the driver's dispatch-wall
rules (2-step dispatches), and record throughput + peak-HBM figures.

The reference cannot represent this regime at all: its octree walk and
kNN build are serial per-particle host loops (gravOctree_Single.jl:239-
278), ~hours/step at N=1e7.

Writes bench_data/scale_1e7.json; bench.py surfaces the committed
artifact as scale_* keys (the lane costs a large fresh compile + ~2 min
of host kNN, too slow to re-pay on every bench run).

Usage: python exp_scale.py [N] [--state uniform|contrast|both]
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

N = int(float(sys.argv[1])) if len(sys.argv) > 1 and sys.argv[1][0].isdigit() \
    else 10_000_000
KH = 50
TIMED_STEPS = 4
# cap headroom: 1.1 shaves the slot planes ~25% vs the planner's 1.25
# default (the certificate still guards drift — a tight cap can only
# cost a fallback, never wrong physics)
HEADROOM = float(os.environ.get("SPHTPU_SCALE_HEADROOM", "1.1"))


def make_state(kind: str, n: int):
    rng = np.random.default_rng(11)
    if kind == "uniform":
        u = rng.random((n, 3))
        r = u[:, 0] ** (1 / 3)
    else:
        # mild-contrast gaussian profile (rho ~ exp(-r^2 / 2 sigma^2),
        # sigma = 0.4 R, truncated at R): central-to-edge density
        # contrast ~ e^{3.1} ~ 22, h contrast ~ 2.8 — the mild-contrast
        # regime. (sigma = R/3's contrast-90 state pushes core cell
        # occupancy past the 256-slot planner cap at N=1e7; that regime
        # belongs to the block/mlevel engines, whose candidate tables
        # do not fit this N — a documented scale boundary.)
        from scipy.special import gammainc

        u = rng.random((n, 3))
        # inverse CDF of the 3D gaussian radial mass profile by table
        rr = np.linspace(0, 1.0, 4097)
        sig = 0.4
        cdf = gammainc(1.5, 0.5 * (rr / sig) ** 2)
        cdf /= cdf[-1]
        r = np.interp(u[:, 0], cdf, rr)
    costh = 2 * u[:, 1] - 1
    ph = 2 * np.pi * u[:, 2]
    sinth = np.sqrt(1 - costh**2)
    pos = np.stack(
        [r * sinth * np.cos(ph), r * sinth * np.sin(ph), r * costh], axis=1
    ).astype(np.float64)
    vel = (0.02 * rng.standard_normal((n, 3))).astype(np.float64)
    return pos, vel


def run_lane(kind: str):
    from scipy.spatial import cKDTree

    from sphtpu.engine import EngineConfig, Params, State
    from sphtpu.physics.tiles import choose_tile_params, choose_tile_params_ml

    cache = f"/tmp/scale_state_{kind}_{N}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        pos, vel, h0 = d["pos"], d["vel"], d["h0"]
        print(f"[{kind}] state + kNN from cache", flush=True)
    else:
        print(f"[{kind}] building state N={N}", flush=True)
        pos, vel = make_state(kind, N)
        t0 = time.time()
        d_knn, _ = cKDTree(pos).query(pos, k=KH, workers=-1)
        h0 = (d_knn[:, -1] / 2.0).astype(np.float64)
        print(f"[{kind}] host kNN {time.time() - t0:.0f}s "
              f"h_ratio={h0.max() / h0.min():.1f}", flush=True)
        np.savez(cache, pos=pos, vel=vel, h0=h0)

    budget = 0
    tp = choose_tile_params(pos, h0, KH, headroom=HEADROOM)
    if tp is None:
        tpo = choose_tile_params_ml(pos, h0, KH, headroom=HEADROOM)
        assert tpo is not None, "no certifiable tile config at this state"
        grid, cap, budget = tpo
        tp = (grid, cap)
    jd = jnp.float32
    # P3M geometry at grid ~75: the padded FFT must stay <= ~512 per
    # edge (TPU FFT workspace at pad 768 demanded 38.6 GB — measured
    # compile OOM), so mesh_factor=5's pad-768 mesh is out. mesh_factor
    # = 3 with sigma_cells = 1.35 keeps the tail stencil at 5^3
    # (c_halfwidth = ceil(4.4 * 1.35 / 3) = 2) on a pad-480 mesh; the
    # narrower Gaussian costs ~1.6x mesh-machinery error (still ~1e-3
    # rms class, the reference-octree accuracy neighborhood).
    mf = int(os.environ.get("SPHTPU_SCALE_MESH_FACTOR", "3"))
    sc = float(os.environ.get("SPHTPU_SCALE_SIGMA_CELLS", "1.35"))
    cfg = EngineConfig(
        n=N, kh=KH, eos="polytropic", dtype="float32", tile=tp,
        gravity="p3m", outlier_budget=budget, mesh_factor=mf,
        sigma_cells=sc,
        # the gather fallback branch's (N, Kh) planes alone are ~30+ GB
        # at N=1e7 — compile without it; a failed cert discards the step
        # and this script re-plans (EngineConfig.fallback)
        fallback="none",
    )
    print(f"[{kind}] tile={tp} budget={budget} mesh_gm={cfg.mesh_gm} "
          f"pad={cfg.mesh_pad} c_halfwidth={cfg.c_halfwidth}", flush=True)
    params = Params(
        m=jnp.asarray(1.0 / N, jd),
        gamma=jnp.asarray(5.0 / 3.0, jd),
        cs0=jnp.asarray(0.0, jd),
        alpha=jnp.asarray(1.0, jd),
        beta=jnp.asarray(2.0, jd),
        U0=jnp.asarray(0.0, jd),
        t_end=jnp.asarray(1e30, jd),
    )
    state = State(
        pos=jnp.asarray(pos, jd),
        vel=jnp.asarray(vel, jd),
        K=jnp.asarray(np.full(N, 0.02), jd),
        t=jnp.asarray(0.0, jd),
    )
    h_dev = jnp.asarray(h0, jd)

    # Two dispatches per KDK step (one per force evaluation): a single
    # fused step at N=1e7 runs ~80-100 s of device wall, past the ~55 s
    # dispatch watchdog (BASELINE.md round 4) — the step must be SPLIT
    # across dispatches at this scale. Same math as engine/step.make_step,
    # same force_eval; the split point is the half-step state.
    from sphtpu.engine.step import _adaptive_dt, _diagnostics, force_eval
    from sphtpu.physics import evolve_K
    from sphtpu.physics.mesh_gravity import greens_hat

    # ghat/params must be jit ARGUMENTS: closure-captured device arrays
    # get baked as program constants, which forces a (1.8 GB) device->
    # host copy at trace time — unimplemented on the axon backend
    ghat = jax.jit(
        lambda: greens_hat(cfg.mesh_pad, cfg.sigma_cells, jd)
    )()

    @jax.jit
    def d1(st, p, gh, h_hint):
        pos, vel, K = st.pos, st.vel, st.K
        acc, sf, phi, fb1 = force_eval(cfg, p, pos, vel, K, h_hint, gh)
        dt = _adaptive_dt(p, sf, acc, vel)
        vel_r2 = jnp.sum(vel * vel, axis=1)
        stats = _diagnostics(cfg, p, st, sf, phi, vel_r2)
        pos_half = pos + vel * (dt / 2.0)
        vel_half = vel + acc * (dt / 2.0)
        K_mid = evolve_K(K, sf.visc_dk, p.gamma, sf.rho, dt)
        return pos_half, vel_half, K_mid, dt, stats, sf.h, fb1

    @jax.jit
    def d2(st, p, gh, pos_half, vel_half, K_mid, dt, h_sf):
        acc2, sf2, _, fb2 = force_eval(
            cfg, p, pos_half, vel_half, K_mid, h_sf, gh
        )
        K_new = evolve_K(K_mid, sf2.visc_dk, p.gamma, sf2.rho, dt)
        vel_new = st.vel + acc2 * dt
        pos_new = st.pos + vel_new * dt - 0.5 * acc2 * dt**2
        return (
            State(pos_new, vel_new, K_new, st.t + dt), sf2.h, fb2,
        )

    def fetch(tree):
        return [np.asarray(x).ravel()[:1] for x in jax.tree.leaves(tree)]

    def one_step(st, h):
        ph, vh, km, dt, stats, h_sf, fb1 = d1(st, params, ghat, h)
        fetch((fb1,))  # dispatch boundary: keep each under the watchdog
        st2, h2, fb2 = d2(st, params, ghat, ph, vh, km, dt, h_sf)
        fetch((fb2,))
        assert int(np.asarray(fb1)) == 0 and int(np.asarray(fb2)) == 0, (
            "certificate must hold on the scale lane"
        )
        return st2, h2, stats

    t0 = time.time()
    st, h_w, stats = one_step(state, h_dev)
    fetch((stats,))
    compile_s = time.time() - t0
    print(f"[{kind}] compile+warm {compile_s:.0f}s", flush=True)

    steps = 0
    nfb = jnp.zeros((1,), jnp.int32)
    t0 = time.time()
    while steps < TIMED_STEPS:
        st, h_w, stats = one_step(st, h_w)
        fetch((stats,))
        assert np.isfinite(np.asarray(stats)).all()
        steps += 1
    elapsed = time.time() - t0

    mem = None
    try:
        ms = jax.devices()[0].memory_stats()
        if ms:
            mem = int(ms.get("peak_bytes_in_use", 0))
    except Exception:
        pass

    out = {
        "n_particles": N,
        "state": kind,
        "particle_steps_per_s": round(N * steps / elapsed, 1),
        "ms_per_force_pass": round(elapsed / (steps * 2) * 1e3, 1),
        "fallback_evals": int(np.asarray(nfb).sum()),
        "tile": list(tp),
        "outlier_budget": budget,
        "mesh_pad": cfg.mesh_pad,
        "compile_and_warm_s": round(compile_s, 1),
        "peak_hbm_bytes": mem,
        "h_ratio": round(float(h0.max() / h0.min()), 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    which = "both"
    if "--state" in sys.argv:
        which = sys.argv[sys.argv.index("--state") + 1]
    lanes = ("uniform", "contrast") if which == "both" else (which,)
    results = {}
    out_path = "bench_data/scale_1e7.json"
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)  # merge: keep lanes run earlier
    for kind in lanes:
        results[kind] = run_lane(kind)
    os.makedirs("bench_data", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote bench_data/scale_1e7.json", flush=True)


if __name__ == "__main__":
    main()

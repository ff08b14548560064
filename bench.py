"""Headline benchmark: particle-steps/sec on one chip.

Config: Boss-Bodenheimer rotating-cloud collapse (the canonical SPH
benchmark, BASELINE.json configs[3]) at N=100_000, Kh=50, polytropic EOS —
the driver metric "particle-steps/sec/chip at N=1e5; ms per
density+force+gravity pass".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

vs_baseline: the reference publishes no numbers and Julia is not in this
image (BASELINE.md), so the denominator is the committed single-core CPU
stand-in `baseline_cpu.py` — the reference's own per-pass algorithms
(cKDTree kNN + vectorized numpy pair sums + the reference-faithful C
octree at theta=0.576), each leg at least as fast as the Julia original,
measured on this host at N=1e5. The ratio is therefore a LOWER bound on
the true speedup over the Julia reference.

Hard regime: when bench_data/bb_collapsed.npz exists (a deep-collapse
state produced by collapse-driving the engine, VERDICT r1 item 7), the
bench also times a warm restart from it and reports hard_* keys — the
regime where tile certification is actually stressed.

Timing methodology: steps run inside one jitted lax.scan chunk and the
result is fetched to host (block_until_ready does not actually synchronize
on the axon tunnel backend), so per-dispatch latency is amortized and
excluded-compile wall time is what a production run sees.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

N = 100_000
KH = 50
WARM_STEPS = 2
# the production chunk length: the driver dispatches snapInterval=10-step
# chunks (capped at driver.MAX_SCAN_STEPS=10); measured ps/s is flat from
# 2 to 10 steps/chunk (BASELINE.md scan-length table), so this times what
# a real campaign sees
BENCH_STEPS = 10

# vs_baseline denominator: bench_data/baseline_cpu.json, produced by
# `python baseline_cpu.py 100000` (committed with its provenance there)
# hard-regime fixture: the deepest committed collapse state (round 3:
# contrast ~1001, cut at the campaign's contrast peak; the round-2
# contrast-395 state is kept for cross-round comparability)
_HARD_DEEP = os.path.join("bench_data", "bb_collapsed_deep.npz")
HARD_STATE = (
    _HARD_DEEP
    if os.path.exists(_HARD_DEEP)
    else os.path.join("bench_data", "bb_collapsed.npz")
)


def build_state():
    from scipy.spatial import cKDTree

    from sphtpu import constants as C
    from sphtpu.engine import EngineConfig, Params, State
    from sphtpu.physics.tiles import choose_tile_params
    from sphtpu.scenes.generators import boss_bodenheimer
    from sphtpu.scenes.setup import DEFAULTS
    from sphtpu.units import UnitSystem

    rng = np.random.default_rng(42)
    R = DEFAULTS["R"]
    M = DEFAULTS["M"]
    pos, vel, rho_vec = boss_bodenheimer(N, R, M, rng=rng)
    gamma = DEFAULTS["gamma"]
    K_cgs = C.KB * DEFAULTS["T"] / (
        DEFAULTS["mu"] * C.MH * rho_vec[0] ** (gamma - 1.0)
    )
    u = UnitSystem.from_constants(C.G_CGS, M, R)
    jd = jnp.float32

    pos_code = pos / u.L
    d_knn, _ = cKDTree(pos_code).query(pos_code, k=KH)
    h0 = d_knn[:, -1] / 2.0
    from sphtpu.engine.driver import P3M_MIN_N

    grav = "p3m" if N >= P3M_MIN_N else "exact"
    # the driver's planner order: class-compacted tiles first (exact
    # gravity), then the legacy full-cap sweep
    classes = None
    if grav == "exact" and not os.environ.get("SPHTPU_BENCH_LEGACY_TILES"):
        from sphtpu.physics.ctiles import choose_tile_classes

        tp_cls = choose_tile_classes(pos_code, h0, KH)
        if tp_cls is not None:
            tile = tp_cls[:2]
            classes = tp_cls[2]
    if classes is None:
        tile = choose_tile_params(pos_code, h0, KH)
    cfg = EngineConfig(
        n=N, kh=KH, eos="polytropic", dtype="float32", tile=tile,
        tile_classes=classes, gravity=grav,
    )
    params = Params(
        m=jnp.asarray(M / N / u.M, jd),
        gamma=jnp.asarray(gamma, jd),
        cs0=jnp.asarray(0.0, jd),
        alpha=jnp.asarray(DEFAULTS["alpha"], jd),
        beta=jnp.asarray(DEFAULTS["beta"], jd),
        U0=jnp.asarray(0.0, jd),
        t_end=jnp.asarray(1e30, jd),
    )
    state = State(
        pos=jnp.asarray(pos_code, jd),
        vel=jnp.asarray(vel / u.V, jd),
        K=jnp.asarray(np.full(N, K_cgs) / u.K_entropy(gamma), jd),
        t=jnp.asarray(0.0, jd),
    )
    return cfg, params, state, jnp.asarray(h0, jd)


def fetch(tree):
    """Force real completion: pull a scalar from every output leaf."""
    return [np.asarray(leaf).ravel()[:1] for leaf in jax.tree.leaves(tree)]


def bench_hard_regime():
    """Warm restart from the committed deep-collapse state; returns extras
    dict (or {} when the fixture/toolchain is absent)."""
    if not os.path.exists(HARD_STATE):
        return {}
    from sphtpu.engine import EngineConfig, Params, State, make_chunk_runner
    from sphtpu.engine.driver import ML_SUBCHUNK, P3M_MIN_N
    from sphtpu.physics.blocks import block_args_for_spec, plan_blocks
    from sphtpu.physics.mlevel import mlevel_args_still_ok, plan_mlevel
    from sphtpu.physics.tiles import choose_tile_params_ml

    d = np.load(HARD_STATE)
    n = d["pos"].shape[0]
    jd = jnp.float32
    grav = "p3m" if n >= P3M_MIN_N else "exact"
    mlargs = None
    # mirror the driver's engine preference under contrast: the
    # block-compact engine first, the multi-level strip engine next,
    # the outlier-lane tiles last
    blk = plan_blocks(d["pos"], d["h"], KH, gravity=grav)
    ml = None if blk is not None else plan_mlevel(d["pos"], d["h"], KH, gravity=grav)
    if blk is not None:
        spec, mlargs = blk
        cfg = EngineConfig(
            n=n, kh=KH, eos="polytropic", dtype="float32", blocks=spec,
            gravity=grav,
        )
        hard_engine = {
            "hard_blocks": [list(b) for b in spec[0]],
            "hard_block_slots": sum(cb * nb for cb, nb in spec[0]) * 128,
        }
    elif ml is not None:
        spec, mlargs = ml
        cfg = EngineConfig(
            n=n, kh=KH, eos="polytropic", dtype="float32", mlevel=spec,
            gravity=grav,
        )
        hard_engine = {"hard_mlevel": [list(lv) for lv in spec[0]],
                       "hard_res_budget": spec[1]}
    else:
        tp = choose_tile_params_ml(d["pos"], d["h"], KH)
        if tp is None:
            return {"hard_note": "no certifiable tile config (gather regime)"}
        grid, cap, budget = tp
        cfg = EngineConfig(
            n=n, kh=KH, eos="polytropic", dtype="float32", tile=(grid, cap),
            gravity=grav, outlier_budget=budget,
        )
        hard_engine = {"hard_tile": [grid, cap], "hard_outlier_budget": budget}
    params = Params(
        m=jnp.asarray(float(d["m"]), jd),
        gamma=jnp.asarray(5.0 / 3.0, jd),
        cs0=jnp.asarray(0.0, jd),
        alpha=jnp.asarray(1.0, jd),
        beta=jnp.asarray(2.0, jd),
        U0=jnp.asarray(0.0, jd),
        t_end=jnp.asarray(1e30, jd),
    )
    state = State(
        pos=jnp.asarray(d["pos"], jd),
        vel=jnp.asarray(d["vel"], jd),
        K=jnp.asarray(d["K"], jd),
        t=jnp.asarray(float(d["t"]), jd),
    )
    h0 = jnp.asarray(d["h"], jd)
    chunk = make_chunk_runner(cfg)

    # production dispatch pattern: ML_SUBCHUNK-step sub-chunks with the
    # traced strip lists refreshed between them (host pass, no recompile,
    # the driver's ML_SUBCHUNK cadence); timed region includes the
    # refresh — it is a real production cost
    sub = (
        ML_SUBCHUNK
        if (cfg.mlevel is not None or cfg.blocks is not None)
        else BENCH_STEPS
    )

    n_replans = 0
    refit_fails = []

    def run_sub(st, h):
        """One production sub-chunk. Returns (state, h, fallbacks,
        replan_wall_s, timed_steps): when the compiled spec stops
        certifying (mlevel_args_still_ok returns None) the driver's
        response is a replan, so the bench replans too. The replan
        sub-chunk (host planning + fresh XLA compile + warm run) is
        excluded from the throughput window — production amortizes
        compiles across the whole campaign via the compile cache +
        hysteresis, which a 10-step bench window cannot — and is
        reported separately as hard_replans."""
        nonlocal mlargs, cfg, chunk, n_replans
        replan_wall = 0.0
        if cfg.mlevel is not None or cfg.blocks is not None:
            t_r = time.time()
            if cfg.blocks is not None:
                ref = block_args_for_spec(
                    np.asarray(st.pos, np.float64),
                    np.asarray(h, np.float64),
                    cfg.blocks, gravity=cfg.gravity,
                )
            else:
                ref = mlevel_args_still_ok(
                    np.asarray(st.pos, np.float64),
                    np.asarray(h, np.float64),
                    cfg.mlevel,
                )
            if ref is not None:
                mlargs = ref
            else:
                if cfg.blocks is not None:
                    from sphtpu.physics.blocks import last_refit_fail

                    refit_fails.append(last_refit_fail())
                if cfg.blocks is not None:
                    ml2 = plan_blocks(
                        np.asarray(st.pos, np.float64),
                        np.asarray(h, np.float64),
                        KH, gravity=cfg.gravity,
                    )
                else:
                    ml2 = plan_mlevel(
                        np.asarray(st.pos, np.float64),
                        np.asarray(h, np.float64),
                        KH, gravity=cfg.gravity,
                    )
                if ml2 is not None:
                    import dataclasses

                    spec2, mlargs = ml2
                    cfg = dataclasses.replace(
                        cfg,
                        **(
                            {"blocks": spec2}
                            if cfg.blocks is not None
                            else {"mlevel": spec2}
                        ),
                    )
                    chunk = make_chunk_runner(cfg)
                    n_replans += 1
                    replan_wall = time.time() - t_r
                    # exclude the fresh compile by a warm call; its steps
                    # are excluded from the timed count too (timed=0)
                    st2, _, v2, h2, _, _ = chunk(
                        st, params, h, n_steps=sub, mlargs=mlargs
                    )
                    fetch(v2)
                    st, h = st2, h2
                    return st, h, 0, replan_wall, 0
            replan_wall = time.time() - t_r
        st, stats, valid, h, _, nfb = chunk(
            st, params, h, n_steps=sub, mlargs=mlargs
        )
        fetch((stats, valid, nfb))
        assert bool(np.asarray(valid).all())
        return st, h, int(np.asarray(nfb).sum()), replan_wall, sub

    st, h = state, h0
    t0 = time.time()
    st, h, _, _, _ = run_sub(st, h)  # compile + warm
    hard_compile_s = time.time() - t0
    n_sub = max(BENCH_STEPS // sub, 1)
    nfb_tot = 0
    steps = 0
    compile_excluded = 0.0
    t0 = time.time()
    for _ in range(n_sub):
        t_k = time.time()
        st, h, nfb_k, _, timed_k = run_sub(st, h)
        if timed_k == 0:
            # replan sub-chunk: its wall time (dominated by the fresh
            # XLA compile) is excluded from the throughput window
            compile_excluded += time.time() - t_k
        nfb_tot += nfb_k
        steps += timed_k
    elapsed = time.time() - t0 - compile_excluded
    if steps == 0:
        steps, elapsed = sub, float("inf")
    out = {
        "hard_n_particles": n,
        "hard_contrast": float(d["contrast"]),
        "hard_particle_steps_per_s": round(n * steps / elapsed, 1),
        "hard_ms_per_force_pass": round(elapsed / (steps * 2) * 1e3, 2),
        "hard_fallback_evals": nfb_tot,
        "hard_replans": n_replans,
        "hard_refit_fails": refit_fails,
        "hard_compile_and_warm_s": round(hard_compile_s, 1),
    }
    # analytic roofline for the hard pass (sphtpu/roofline.py)
    if cfg.blocks is not None and elapsed != float("inf"):
        from sphtpu.roofline import (
            add_counts, allpairs_gravity_counts, block_force_counts,
            p3m_mesh_counts, roofline_report,
        )

        cnt = block_force_counts(cfg.blocks, n, KH, gravity=cfg.gravity)
        cnt = add_counts(
            cnt,
            p3m_mesh_counts(cfg.mesh_pad, n)
            if cfg.gravity == "p3m"
            else allpairs_gravity_counts(n),
        )
        roof = roofline_report(cnt, elapsed / (steps * 2))
        out.update({f"hard_{k}": v for k, v in roof.items()})
    out.update(hard_engine)
    return out


def bench_isothermal():
    """Isothermal production lane (VERDICT r3 weak-5): the reference
    ships isothermal_sim.jl as a co-equal driver (isothermal_sim.jl:72-
    298), so the bench times the same N=1e5 chunk protocol on the
    isothermal EOS too — sample_isothermal_sphere (BASELINE.json
    configs[1] class), scalar cs, asymmetric ct pair term."""
    import tempfile

    from scipy.spatial import cKDTree

    from sphtpu.engine import EngineConfig, Params, State, make_chunk_runner
    from sphtpu.engine.driver import P3M_MIN_N
    from sphtpu.io import read_snapshot, snapshot_path
    from sphtpu.physics.blocks import plan_blocks
    from sphtpu.physics.tiles import choose_tile_params
    from sphtpu.scenes.setup import iniconds_setup
    from sphtpu.units import UnitSystem

    with tempfile.TemporaryDirectory() as root:
        iniconds_setup(
            "isothermal", "sample_isothermal_sphere", root=root, N=N, rng=42
        )
        snap = read_snapshot(
            snapshot_path(root, "sample_isothermal_sphere", "1")
        )
    c = dict(snap["constants"])
    kh = int(c["Kh"])
    u = UnitSystem.from_constants(float(c["G"]), float(c["M"]), float(c["R"]))
    jd = jnp.float32
    pos_code = np.asarray(snap["pos"]) / u.L
    d_knn, _ = cKDTree(pos_code).query(pos_code, k=kh)
    h0 = d_knn[:, -1] / 2.0
    grav = "p3m" if N >= P3M_MIN_N else "exact"
    # the driver's auto engine order: mono tiles, then block-compact
    mlargs = None
    tp = choose_tile_params(pos_code, h0, kh, headroom=1.5)
    if tp is not None:
        cfg = EngineConfig(
            n=N, kh=kh, eos="isothermal", dtype="float32", tile=tp,
            gravity=grav,
        )
        engine_note = {"iso_tile": list(tp)}
    else:
        blk = plan_blocks(pos_code, h0, kh, gravity=grav)
        if blk is None:
            return {"iso_note": "no certifiable tile/block config"}
        spec, mlargs = blk
        cfg = EngineConfig(
            n=N, kh=kh, eos="isothermal", dtype="float32", blocks=spec,
            gravity=grav,
        )
        engine_note = {
            "iso_blocks": [list(b) for b in spec[0]],
        }
    params = Params(
        m=jnp.asarray(float(c["m"]) / u.M, jd),
        gamma=jnp.asarray(5.0 / 3.0, jd),
        cs0=jnp.asarray(float(c["cs"]) / u.V, jd),
        alpha=jnp.asarray(float(c["alpha"]), jd),
        beta=jnp.asarray(float(c["beta"]), jd),
        U0=jnp.asarray(float(c["U"]) / u.E, jd),
        t_end=jnp.asarray(1e30, jd),
    )
    state = State(
        pos=jnp.asarray(pos_code, jd),
        vel=jnp.asarray(np.asarray(snap["vel"]) / u.V, jd),
        K=jnp.asarray(np.zeros(N), jd),
        t=jnp.asarray(0.0, jd),
    )
    h_dev = jnp.asarray(h0, jd)
    chunk = make_chunk_runner(cfg)
    t0 = time.time()
    st, stats, valid, h_w, _, nfb = chunk(
        state, params, h_dev, n_steps=BENCH_STEPS, mlargs=mlargs
    )
    fetch((stats, valid, nfb))
    iso_compile_s = time.time() - t0
    t0 = time.time()
    st, stats, valid, _, _, nfb = chunk(
        st, params, h_w, n_steps=BENCH_STEPS, mlargs=mlargs
    )
    fetch((stats, valid, nfb))
    elapsed = time.time() - t0
    assert bool(np.asarray(valid).all())
    out = {
        "iso_particle_steps_per_s": round(N * BENCH_STEPS / elapsed, 1),
        "iso_ms_per_force_pass": round(elapsed / (BENCH_STEPS * 2) * 1e3, 2),
        "iso_fallback_evals": int(np.asarray(nfb).sum()),
        "iso_gravity": grav,
        "iso_compile_and_warm_s": round(iso_compile_s, 1),
    }
    # analytic roofline for the iso pass (VERDICT r4 next-4: the iso lane
    # must carry the same instrument as the polytropic lanes)
    from sphtpu.roofline import (
        add_counts, allpairs_gravity_counts, block_force_counts,
        p3m_mesh_counts, roofline_report, tile_force_counts,
    )

    if cfg.blocks is not None:
        cnt = block_force_counts(cfg.blocks, N, kh, gravity=grav)
        out["iso_block_slots"] = sum(
            cb * nb for cb, nb in cfg.blocks[0]
        ) * 128
    else:
        cnt = tile_force_counts(cfg.tile[0], cfg.tile[1], N, kh, gravity=grav)
    cnt = add_counts(
        cnt,
        p3m_mesh_counts(cfg.mesh_pad, N)
        if grav == "p3m"
        else allpairs_gravity_counts(N),
    )
    out.update({
        f"iso_{k}": v
        for k, v in roofline_report(cnt, elapsed / (BENCH_STEPS * 2)).items()
    })
    out.update(engine_note)
    # f32-vs-f64 precision window (VERDICT r4 next-4): measured by
    # iso_precision.py (two on-chip lanes from the same fixture; ~an
    # hour of f64 wall), committed as iso_precision.json — the bench
    # reports the committed artifact rather than re-paying the f64 lane
    # every run. Provenance/window details live in the artifact itself.
    prec_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "iso_precision.json"
    )
    if os.path.exists(prec_path):
        with open(prec_path) as f:
            prec = json.load(f)
        out["iso_f32_f64_max_rel_dE"] = prec.get("iso_f32_f64_max_rel_dE")
        out["iso_f32_f64_median_rel_dE"] = prec.get(
            "iso_f32_f64_median_rel_dE"
        )
        out["iso_f32_f64_note"] = (
            f"committed iso_precision.json artifact: {prec.get('n_steps')} "
            f"steps at N={prec.get('N')}"
        )
    return out


def _headline_probe():
    """Subprocess body for the cold/warm compile probes: build the exact
    headline chunk runner, time first-call compile + warm fetch, print
    one float. The parent controls the persistent-cache state via
    SPHTPU_COMPILE_CACHE, so the same code measures both lanes."""
    from sphtpu.engine import make_chunk_runner

    cfg, params, state, h0 = build_state()
    chunk = make_chunk_runner(cfg)
    t0 = time.time()
    _, stats, valid, _, _, nfb = chunk(state, params, h0, n_steps=BENCH_STEPS)
    fetch((stats, valid, nfb))
    print(f"PROBE_SECONDS {time.time() - t0:.1f}")


def compile_probes():
    """Cold / warm compile cost of the headline program as subprocesses
    (VERDICT r4 next-3: compile cost must be a tracked metric, split by
    cache state). Runs BEFORE the parent touches the device:

    * warm probe: ambient persistent cache (~/.cache/jax_sphtpu) — what a
      user's second run pays;
    * cold probe: a fresh temp cache dir — the true cold-start cost.

    Probe failures (worker crash, timeout) record None, never blank the
    bench."""
    import subprocess
    import sys
    import tempfile

    def run_probe(env_extra):
        env = dict(os.environ, **env_extra)
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--probe"],
                capture_output=True, text=True, timeout=3600, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            for line in p.stdout.splitlines():
                if line.startswith("PROBE_SECONDS"):
                    return float(line.split()[1])
        except Exception:
            pass
        return None

    warm = run_probe({})
    with tempfile.TemporaryDirectory() as fresh:
        cold = run_probe({"SPHTPU_COMPILE_CACHE": fresh})
    return cold, warm


def main():
    from sphtpu.engine import make_chunk_runner

    cold_s, warm_s = (
        (None, None) if os.environ.get("SPHTPU_SKIP_PROBES") else
        compile_probes()
    )
    cfg, params, state, h0 = build_state()
    chunk = make_chunk_runner(cfg)

    # warm with the SAME static n_steps as the timed chunk — a different
    # length is a different XLA program and would compile inside the
    # timed region
    t0 = time.time()
    state_w, stats, valid, h_w, _, nfb = chunk(state, params, h0, n_steps=BENCH_STEPS)
    fetch((stats, valid, nfb))
    compile_and_warm_s = time.time() - t0

    t0 = time.time()
    state_b, stats, valid, _, _, nfb = chunk(state_w, params, h_w, n_steps=BENCH_STEPS)
    fetch((stats, valid, nfb))
    elapsed = time.time() - t0

    assert bool(np.asarray(valid).all()), "bench steps must all execute"
    assert np.isfinite(np.asarray(stats)).all(), "non-finite stats in bench"
    n_fallback = int(np.asarray(nfb).sum())

    steps_per_sec = BENCH_STEPS / elapsed
    value = N * steps_per_sec
    # two full density+force+gravity passes per KDK step
    ms_per_pass = elapsed / (BENCH_STEPS * 2) * 1e3

    vs_baseline = None
    base_path = os.path.join("bench_data", "baseline_cpu.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("N") == N:
            vs_baseline = round(
                value / base["baseline_particle_steps_per_s"], 1
            )

    out = {
        "metric": "particle-steps/sec/chip at N=1e5 (boss_bodenheimer, polytropic, Kh=50)",
        "value": round(value, 1),
        "unit": "particle-steps/s",
        "vs_baseline": vs_baseline,
        "vs_baseline_note": "ratio vs baseline_cpu.py (single-core C/scipy "
        "stand-in for the Julia reference; lower bound on true speedup)"
        if vs_baseline is not None
        else None,
        "ms_per_force_pass": round(ms_per_pass, 2),
        "steps_per_sec": round(steps_per_sec, 4),
        "n_particles": N,
        "fallback_evals": n_fallback,
        "tile_params": list(cfg.tile) if cfg.tile else None,
        "gravity": cfg.gravity,
        "compile_and_warm_s": round(compile_and_warm_s, 1),
        "headline_cold_compile_s": cold_s,
        "headline_warm_compile_s": warm_s,
        "backend": jax.default_backend(),
    }
    # analytic roofline for the headline pass (sphtpu/roofline.py):
    # answers "is 396 ms/pass fast for this chip" — the CPU-baseline
    # ratio alone cannot (VERDICT r3 weak-3)
    if cfg.tile is not None:
        from sphtpu.roofline import (
            add_counts, allpairs_gravity_counts, ctile_force_counts,
            p3m_mesh_counts, roofline_report, tile_force_counts,
        )

        if cfg.tile_classes is not None:
            cnt = ctile_force_counts(
                cfg.tile_classes, cfg.tile[1], N, KH, gravity=cfg.gravity
            )
        else:
            cnt = tile_force_counts(
                cfg.tile[0], cfg.tile[1], N, KH, gravity=cfg.gravity
            )
        cnt = add_counts(
            cnt,
            p3m_mesh_counts(cfg.mesh_pad, N)
            if cfg.gravity == "p3m"
            else allpairs_gravity_counts(N),
        )
        out["roofline"] = roofline_report(cnt, elapsed / (BENCH_STEPS * 2))
    # N=1e7 scale lane (VERDICT r4 next-7): measured by exp_scale.py
    # (uniform + mild-contrast states, tile+P3M engine, driver-standard
    # 2-step dispatches) and committed as bench_data/scale_1e7.json —
    # the lane costs ~2 min of host kNN + a large fresh compile, too
    # slow to re-pay on every bench run.
    scale_path = os.path.join("bench_data", "scale_1e7.json")
    if os.path.exists(scale_path):
        with open(scale_path) as f:
            scale = json.load(f)
        for kind, r in scale.items():
            out[f"scale_{kind}_n"] = r.get("n_particles")
            out[f"scale_{kind}_particle_steps_per_s"] = r.get(
                "particle_steps_per_s"
            )
            out[f"scale_{kind}_ms_per_force_pass"] = r.get(
                "ms_per_force_pass"
            )
            out[f"scale_{kind}_fallback_evals"] = r.get("fallback_evals")
            out[f"scale_{kind}_peak_hbm_bytes"] = r.get("peak_hbm_bytes")
        out["scale_note"] = (
            "committed exp_scale.py artifact (bench_data/scale_1e7.json)"
        )
    out.update(bench_hard_regime())
    try:
        out.update(bench_isothermal())
    except Exception as e:  # noqa: BLE001 — iso lane must not blank the bench
        out["iso_note"] = f"iso lane failed: {type(e).__name__}: {e}"
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    if "--probe" in sys.argv:
        _headline_probe()
        raise SystemExit(0)
    # the axon TPU worker intermittently crashes/restarts (infra, not
    # workload: identical runs succeed on retry); don't let a transient
    # outage blank the benchmark
    for _attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            import sys
            import traceback

            traceback.print_exc()
            print(
                f"bench attempt {_attempt} failed ({type(e).__name__}); "
                "retrying after worker recovery",
                file=sys.stderr,
            )
            time.sleep(150)
    else:
        raise SystemExit("bench failed after 3 attempts")

"""Isothermal f32-vs-f64 precision window (VERDICT r4 next-4).

Runs the isothermal production lane (sample_isothermal_sphere N=1e5, the
bench fixture) for a fixed step window in BOTH precisions on the chip
with the same engine selection as bench.py, then compares the total-
energy trajectories E(t) = T + V + 2U (isothermal_sim.jl:177) the way
precision_compare.py does for the polytropic lane: the f64 lane's E(t)
is interpolated onto the f32 lane's time grid (dt sequences differ at
roundoff) and the max/median relative |dE| is reported.

Usage: python iso_precision.py [n_steps=40] [N=100000]
Writes iso_precision.json {max_rel_dE, median_rel_dE, n_steps, N}.

Each lane runs in its OWN subprocess: jax_enable_x64 must be set before
the backend initializes, and enabling it in the parent would silently
promote the f32 lane's host-derived literals too. The parent only
combines the two lanes' (t, E) trajectories.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

import jax

if __name__ == "__main__" and "--lane" in sys.argv:
    _lane_dtype = sys.argv[sys.argv.index("--lane") + 1]
    if _lane_dtype == "float64":
        jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

_POS_ARGS = [a for a in sys.argv[1:] if a.isdigit()]
N_STEPS = int(_POS_ARGS[0]) if _POS_ARGS else 40
N = int(_POS_ARGS[1]) if len(_POS_ARGS) > 1 else 100_000


def run_lane(dtype: str, n_steps: int):
    """Step the iso bench fixture n_steps; returns (t, E) arrays (code
    units). Engine selection mirrors bench.bench_isothermal."""
    from scipy.spatial import cKDTree

    from sphtpu.engine import EngineConfig, Params, State, make_chunk_runner
    from sphtpu.engine.driver import P3M_MIN_N
    from sphtpu.io import read_snapshot, snapshot_path
    from sphtpu.physics.blocks import block_args_for_spec, plan_blocks
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
    jd = jnp.dtype(dtype)
    pos_code = np.asarray(snap["pos"]) / u.L
    d_knn, _ = cKDTree(pos_code).query(pos_code, k=kh)
    h_host = (d_knn[:, -1] / 2.0).astype(np.float64)
    grav = "p3m" if N >= P3M_MIN_N else "exact"
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
    runners = {}
    ts, Es = [], []
    steps = 0
    sub = 2
    while steps < n_steps:
        # per-sub-chunk engine pick with block-args refresh (the
        # production pattern for contrast states)
        eargs = None
        cfg = None
        for c_ in runners:
            if c_.blocks is not None:
                a = block_args_for_spec(
                    np.asarray(state.pos, np.float64), h_host, c_.blocks,
                    gravity=grav,
                )
                if a is not None:
                    cfg, eargs = c_, a
                    break
            elif c_.tile is not None:
                from sphtpu.physics.tiles import tile_params_still_ok

                if tile_params_still_ok(
                    np.asarray(state.pos, np.float64), h_host,
                    c_.tile[0], c_.tile[1], c_.outlier_budget,
                ):
                    cfg = c_
                    break
        if cfg is None:
            tp = choose_tile_params(
                np.asarray(state.pos, np.float64), h_host, kh, headroom=1.5
            )
            if tp is not None:
                cfg = EngineConfig(
                    n=N, kh=kh, eos="isothermal", dtype=dtype, tile=tp,
                    gravity=grav,
                )
            else:
                blk = plan_blocks(
                    np.asarray(state.pos, np.float64), h_host, kh,
                    gravity=grav,
                )
                assert blk is not None, "no certifiable engine for iso lane"
                spec, eargs = blk
                cfg = EngineConfig(
                    n=N, kh=kh, eos="isothermal", dtype=dtype, blocks=spec,
                    gravity=grav,
                )
        if cfg not in runners:
            runners[cfg] = make_chunk_runner(cfg)
        chunk = runners[cfg]
        state, stats, valid, h_dev, _, nfb = chunk(
            state, params, jnp.asarray(h_host, jd), n_steps=sub,
            mlargs=eargs, scan_length=sub,
        )
        stats = np.asarray(stats, np.float64)
        nv = int(np.asarray(valid).sum())
        assert nv == sub and int(np.asarray(nfb).sum()) == 0, (nv, dtype)
        h_host = np.asarray(h_dev, np.float64)
        ts.extend(stats[:nv, 0].tolist())
        Es.extend(stats[:nv, 4].tolist())
        steps += nv
    return np.asarray(ts), np.asarray(Es)


def _lane_main(dtype: str):
    """Subprocess body: run one lane, print its trajectory as JSON."""
    ts, Es = run_lane(dtype, N_STEPS)
    print("LANE_JSON " + json.dumps({"t": ts.tolist(), "E": Es.tolist()}))


def _run_lane_subprocess(dtype: str):
    import subprocess

    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), str(N_STEPS), str(N),
         "--lane", dtype],
        capture_output=True, text=True, timeout=7200,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in p.stdout.splitlines():
        if line.startswith("LANE_JSON "):
            d = json.loads(line[len("LANE_JSON "):])
            return np.asarray(d["t"]), np.asarray(d["E"])
    raise RuntimeError(
        f"{dtype} lane failed (rc={p.returncode}):\n{p.stderr[-2000:]}"
    )


def main():
    t0 = time.time()
    t32, E32 = _run_lane_subprocess("float32")
    print(f"f32 lane done in {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    t64, E64 = _run_lane_subprocess("float64")
    print(f"f64 lane done in {time.time() - t0:.0f}s", flush=True)
    # interpolate the f64 E(t) onto the f32 time grid (dt sequences
    # differ microscopically), skipping the t=0 row
    E64i = np.interp(t32, t64, E64)
    rel = np.abs(E32 - E64i) / np.abs(E64i)
    out = {
        "iso_f32_f64_max_rel_dE": float(rel.max()),
        "iso_f32_f64_median_rel_dE": float(np.median(rel)),
        "n_steps": int(N_STEPS),
        "N": int(N),
        "t_window": [float(t32[0]), float(t32[-1])],
    }
    print(json.dumps(out), flush=True)
    with open("iso_precision.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    if "--lane" in sys.argv:
        _lane_main(sys.argv[sys.argv.index("--lane") + 1])
    else:
        main()

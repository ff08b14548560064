import numpy as np
import pytest

from sphtpu.engine import run_simulation
from sphtpu.io import StatsFile, read_snapshot, snapshot_path
from sphtpu.scenes import iniconds_setup


@pytest.fixture(scope="module")
def gaussian_ic(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("run"))
    iniconds_setup(
        "polytropic", "gaussian_sphere", root=root, N=400, tEnd=5e12
    )
    return root


def test_polytropic_run_and_snapshots(gaussian_ic):
    root = gaussian_ic
    res = run_simulation(
        "polytropic",
        "gaussian_sphere",
        snap_interval=3,
        show_plots=False,
        root=root,
        dtype="float64",
        max_steps=7,
        verbose=False,
    )
    assert res["steps"] == 7
    # cadence: first step snapshots, then every snapInterval, plus the
    # max-steps cut (ids are 1-based iteration ids)
    assert res["snapshot_ids"][0] == 1
    assert res["snapshot_ids"][1] == 4

    # stats written in CGS with monotonically increasing t
    sf = StatsFile(f"{root}/snapshots/gaussian_sphere/stats")
    hist = sf.up_to(res["iter_id"] - 1)
    sf.close()
    t = hist[:, 0]
    assert (np.diff(t) > 0).all()
    assert np.isfinite(hist).all()

    # snapshot round-trips and carries updated constants
    snap = read_snapshot(
        snapshot_path(root, "gaussian_sphere", str(res["snapshot_ids"][-1]))
    )
    c = snap["constants"]
    assert c["iterID"] == res["snapshot_ids"][-1]
    assert c["t"] > 0
    assert snap["K"] is not None
    assert len(snap["rlin"]) == 10000
    assert np.isfinite(snap["pos"]).all()


def test_warm_restart_continues(gaussian_ic):
    root = gaussian_ic
    last = sorted(
        int(f.replace("snap.csv", ""))
        for f in __import__("os").listdir(f"{root}/snapshots/gaussian_sphere/bin")
    )[-1]
    snap_before = read_snapshot(snapshot_path(root, "gaussian_sphere", str(last)))
    res = run_simulation(
        "polytropic",
        "gaussian_sphere",
        snap_id=last,
        snap_interval=3,
        show_plots=False,
        root=root,
        dtype="float64",
        max_steps=2,
        verbose=False,
    )
    assert res["steps"] == 2
    assert res["t_cgs"] > snap_before["constants"]["t"]


def test_energy_and_momentum_conservation(tmp_path):
    """Short Boss-Bodenheimer evolution (default hot gas => rapid adiabatic
    expansion): energy drift stays at discretization level, linear momentum
    stays at round-off, angular momentum is conserved."""
    root = str(tmp_path)
    iniconds_setup("polytropic", "boss_bodenheimer", root=root, N=300)
    res = run_simulation(
        "polytropic",
        "boss_bodenheimer",
        snap_interval=50,
        keep_snaps=False,
        show_plots=False,
        root=root,
        dtype="float64",
        max_steps=25,
        verbose=False,
    )
    assert res["steps"] == 25
    sf = StatsFile(f"{root}/snapshots/boss_bodenheimer/stats")
    hist = sf.up_to(25)
    sf.close()
    E = hist[:, 4]
    scale = np.abs(hist[0, 1:5]).max()
    # N=300/Kh=50 free expansion: per-step drift is discretization-level
    # (<1%), not a blow-up; parity with the reference formulas is pinned
    # per-step in test_physics at ~1e-9.
    per_step_drift = np.abs(np.diff(E)).max() / scale
    assert per_step_drift < 1e-2, f"per-step energy drift {per_step_drift}"
    assert np.abs(E - E[0]).max() / scale < 0.15
    # linear momentum: symmetric pair forces + pairwise gravity => ~round-off
    # relative to the system's momentum scale sqrt(2 T M), M = 1 Msun default
    p_scale = np.sqrt(2.0 * hist[0, 1] * 1.9891e33)
    assert hist[:, 8].max() < 1e-8 * p_scale
    # angular momentum of the rotating cloud is conserved to discretization
    L = hist[:, 9]
    assert np.abs(L - L[0]).max() < 1e-2 * abs(L[0])


def test_f32_matches_f64_short_horizon(tmp_path):
    """Code-unit rescaling keeps the f32 path on the f64 trajectory over a
    few steps (relative energy agreement ~1e-4)."""
    root = str(tmp_path)
    iniconds_setup("polytropic", "gaussian_sphere", root=root, N=300)
    out = {}
    for dt_name in ("float64", "float32"):
        res = run_simulation(
            "polytropic",
            "gaussian_sphere",
            snap_interval=50,
            keep_snaps=False,
            show_plots=False,
            root=root,
            dtype=dt_name,
            max_steps=5,
            verbose=False,
        )
        sf = StatsFile(f"{root}/snapshots/gaussian_sphere/stats")
        out[dt_name] = sf.up_to(5).copy()
        sf.close()
    e64, e32 = out["float64"][:, 4], out["float32"][:, 4]
    np.testing.assert_allclose(e32, e64, rtol=2e-4)
    np.testing.assert_allclose(out["float32"][:, 0], out["float64"][:, 0], rtol=2e-3)


def test_isothermal_run(tmp_path):
    root = str(tmp_path)
    iniconds_setup("isothermal", "sample_isothermal_sphere", root=root, N=300)
    res = run_simulation(
        "isothermal",
        "sample_isothermal_sphere",
        snap_interval=4,
        show_plots=False,
        root=root,
        dtype="float64",
        max_steps=5,
        verbose=False,
    )
    assert res["steps"] == 5
    snap = read_snapshot(
        snapshot_path(root, "sample_isothermal_sphere", str(res["snapshot_ids"][-1]))
    )
    assert snap["K"] is None  # isothermal snapshots carry no K
    c = snap["constants"]
    assert "cs" in c and "U" in c
    assert len(snap["rlin"]) == 1000
    # Etot = T + V + 2U with constant U
    sf = StatsFile(f"{root}/snapshots/sample_isothermal_sphere/stats")
    hist = sf.up_to(5)
    sf.close()
    np.testing.assert_allclose(hist[:, 3], c["U"], rtol=1e-10)
    np.testing.assert_allclose(
        hist[:, 4], hist[:, 1] + hist[:, 2] + 2 * hist[:, 3], rtol=1e-10
    )


def test_float32_stability(tmp_path):
    """The f32 TPU path must stay finite thanks to code-unit rescaling."""
    root = str(tmp_path)
    iniconds_setup("polytropic", "gaussian_sphere", root=root, N=300)
    res = run_simulation(
        "polytropic",
        "gaussian_sphere",
        snap_interval=5,
        show_plots=False,
        root=root,
        dtype="float32",
        max_steps=5,
        verbose=False,
    )
    assert np.isfinite(np.asarray(res["state"].pos)).all()
    assert np.isfinite(res["last_stats_cgs"]).all()
    assert res["t_cgs"] > 0

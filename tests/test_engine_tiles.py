"""End-to-end: the auto (cell-tile) engine reproduces the gather engine."""

import numpy as np

from sphtpu.engine import run_simulation
from sphtpu.io import StatsFile
from sphtpu.scenes import iniconds_setup


def test_auto_engine_matches_gather(tmp_path):
    root = str(tmp_path)
    # N/Kh sized so the mono-level grid is viable (a 2^3 grid with Kh=50
    # neighborhoods overflows any slot capacity and would only test the
    # fallback path)
    iniconds_setup("polytropic", "boss_bodenheimer", root=root, N=1500, Kh=24)
    hist = {}
    for mode in ("gather", "auto"):
        res = run_simulation(
            "polytropic",
            "boss_bodenheimer",
            snap_interval=50,
            keep_snaps=False,
            show_plots=False,
            root=root,
            dtype="float64",
            engine=mode,
            max_steps=4,
            verbose=False,
        )
        assert res["steps"] == 4
        sf = StatsFile(f"{root}/snapshots/boss_bodenheimer/stats")
        hist[mode] = sf.up_to(4).copy()
        sf.close()
        if mode == "auto":
            fb = res["fallback_evals"]
            # uniform-h cloud: the tile path should certify (no fallback)
            assert fb == 0, f"unexpected fallbacks: {fb}"
    a, g = hist["auto"], hist["gather"]
    # normalize per column: |p|, |L| and the com components are
    # roundoff-dominated (sums of ~cancelling terms), so compare against a
    # physical scale, not rtol on a roundoff value
    energy_scale = np.abs(g[:, 1:5]).max()
    r_scale = np.abs(g[:, 0]).max() + np.abs(g[:, 5:8]).max()
    scales = np.array(
        [
            max(np.abs(g[:, 0]).max(), 1e-300),  # t
            energy_scale, energy_scale, energy_scale, energy_scale,
            r_scale, r_scale, r_scale,
            max(np.abs(g[:, 8]).max(), np.sqrt(2 * energy_scale * 2e33)),
            max(np.abs(g[:, 9]).max(), 1e-300),
        ]
    )
    rel = np.abs(a - g) / scales
    assert rel.max() < 1e-8, f"max normalized diff {rel.max()} at {np.unravel_index(rel.argmax(), rel.shape)}"

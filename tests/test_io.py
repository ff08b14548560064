import numpy as np
import pytest

from sphtpu.io import StatsFile, read_snapshot, write_snapshot
from sphtpu.io.snapshot import _fmt_num, snapshot_path


def test_fmt_num_julia_like():
    assert _fmt_num(10000) == "10000"
    assert _fmt_num(0.5) == "0.5"
    assert _fmt_num(1.5e16) == "1.5e16"
    assert _fmt_num(6.6743e-8) == "6.6743e-8"
    assert _fmt_num(True) == "true"
    # floats always keep [eE.] so the Int-vs-Float sniffing stays correct
    assert any(c in _fmt_num(5e12) for c in "eE.")


def test_snapshot_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 17
    pos = rng.standard_normal((n, 3)) * 1e17
    vel = rng.standard_normal((n, 3)) * 1e4
    K = np.abs(rng.standard_normal(n)) * 1e27
    consts = {
        "iterID": 3,
        "N": n,
        "Kh": 50,
        "t": 1.5e10,
        "tEnd": 5e12,
        "gamma": 5 / 3,
        "G": 6.67430e-8,
    }
    rlin = np.linspace(0, 1.5e17, 11)
    rho = np.abs(rng.standard_normal(11)) * 1e-18

    path = write_snapshot(
        "7", "gaussian_sphere", pos, vel, K=K, constants=consts,
        rlin=rlin, rho_radial=rho, root=str(tmp_path),
    )
    assert path == snapshot_path(str(tmp_path), "gaussian_sphere", "7")

    snap = read_snapshot(path)
    np.testing.assert_allclose(snap["pos"], pos, rtol=0)
    np.testing.assert_allclose(snap["vel"], vel, rtol=0)
    np.testing.assert_allclose(snap["K"], K, rtol=0)
    np.testing.assert_allclose(snap["rlin"], rlin, rtol=0)
    np.testing.assert_allclose(snap["rho_radial"], rho, rtol=0)
    # int/float sniffing: iterID/N/Kh stay ints, physics values are floats
    assert snap["constants"]["iterID"] == 3 and isinstance(snap["constants"]["iterID"], int)
    assert isinstance(snap["constants"]["t"], float)
    assert snap["constants"]["tEnd"] == 5e12
    assert abs(snap["constants"]["gamma"] - 5 / 3) < 1e-15


def test_snapshot_isothermal_no_K(tmp_path):
    pos = np.zeros((4, 3))
    vel = np.ones((4, 3))
    path = write_snapshot("1", "plummer", pos, vel, constants={"N": 4}, root=str(tmp_path))
    snap = read_snapshot(path)
    assert snap["K"] is None
    assert snap["rlin"].size == 0


def test_read_reference_style_csv(tmp_path):
    """Parse a hand-written file in the exact textual style Julia CSV.write
    emits (empty cells for missing, Julia float formatting)."""
    txt = (
        "type,x,y,z,vx,vy,vz,K,rlin,rho_radial,constants\n"
        "particle,1.0e16,-2.5e15,0.0,100.0,-5.5,0.25,1.45e27,,,\n"
        "particle,-1.0e16,2.5e15,1.0,0.0,0.0,0.0,1.45e27,,,\n"
        "rlin,,,,,,,,0.0;5.0e15;1.0e16,,\n"
        "rho_radial,,,,,,,,,1.0e-18;5.0e-19;1.0e-20,\n"
        "constants,,,,,,,,,,iterID=1;N=2;Kh=50;t=0;tEnd=5.0e12;gamma=1.6666666666666667\n"
    )
    p = tmp_path / "1snap.csv"
    p.write_text(txt)
    snap = read_snapshot(str(p))
    assert snap["pos"].shape == (2, 3)
    assert snap["pos"][0, 0] == 1.0e16
    assert snap["vel"][0, 2] == 0.25
    assert snap["K"][1] == 1.45e27
    assert snap["constants"]["N"] == 2
    assert snap["constants"]["t"] == 0 and isinstance(snap["constants"]["t"], int)
    assert len(snap["rlin"]) == 3 and snap["rlin"][1] == 5e15


def test_golden_reference_snapshot():
    """Committed byte fixture transcribed in the exact grammar the reference
    writes (SnapshotRW.jl:22-159): CSV.write header order, empty cells for
    missing, Julia shortest-repr float forms including the early e-notation
    switch at 1e6 ("1.5e7" where Python repr says "15000000.0"), ;-joined
    vector rows, hash-scrambled constants order, Int-vs-Float sniffing
    (SnapshotRW.jl:147)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "golden", "1snap.csv")
    snap = read_snapshot(path)

    assert snap["pos"].shape == (4, 3)
    # exact float64 parses of Julia-printed shortest reprs
    assert snap["pos"][0, 0] == -4.7659622806551096e16
    assert snap["pos"][1, 2] == 8.078285115e16
    assert snap["vel"][1, 0] == 1.5e7  # Julia's early e-notation
    assert snap["vel"][1, 2] == -123456.78125
    assert snap["vel"][2, 0] == -0.0001 and snap["vel"][2, 1] == 2.5e-5
    assert snap["K"][0] == 1.9572384000000002e27
    assert snap["K"][2] == 1.9572384e27

    assert len(snap["rlin"]) == 5
    assert snap["rlin"][1] == 1.6156570230000002e16
    assert snap["rho_radial"][0] == 1.5234567890123457e-18

    c = snap["constants"]
    # Int-vs-Float sniffing: no [eE.] => Int (SnapshotRW.jl:147)
    for k in ("N", "Kh", "Kgr", "iterID"):
        assert isinstance(c[k], int)
    assert c["N"] == 4 and c["iterID"] == 7 and c["Kgr"] == 20
    assert isinstance(c["t"], float) and c["t"] == 1.2345678901234e9
    assert c["gamma"] == 1.6666666666666667
    assert c["G"] == 6.6743e-8 and c["tEnd"] == 5.0e12
    assert c["theta"] == 0.576 and c["m"] == 4.97275e32

    # and our writer round-trips the same data values exactly
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p2 = write_snapshot(
            "9", "boss_bodenheimer", snap["pos"], snap["vel"], K=snap["K"],
            constants=c, rlin=snap["rlin"], rho_radial=snap["rho_radial"],
            root=td,
        )
        snap2 = read_snapshot(p2)
        np.testing.assert_array_equal(snap2["pos"], snap["pos"])
        np.testing.assert_array_equal(snap2["vel"], snap["vel"])
        np.testing.assert_array_equal(snap2["K"], snap["K"])
        np.testing.assert_array_equal(snap2["rlin"], snap["rlin"])
        assert snap2["constants"] == c


def test_golden_isothermal_snapshot():
    """Isothermal layout fixture in the reference's exact style: the K
    column exists in the header but every cell is empty (fastv1
    SnapshotRW.jl:45 leaves df.K missing when K=nothing,
    isothermal_sim.jl:274 passes no K), and the constants row carries the
    isothermal dict (cs/U instead of gamma, iniconds.jl:655-671)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "golden", "iso_1snap.csv")
    snap = read_snapshot(path)
    assert snap["K"] is None
    assert snap["pos"].shape == (3, 3)
    assert snap["pos"][0, 0] == 1.234567890123456e18
    assert snap["vel"][2, 0] == 1.0e6 and snap["vel"][2, 1] == -1.5e7
    c = snap["constants"]
    assert c["cs"] == 18860.338169642963
    assert c["U"] == 1.0613e42
    assert isinstance(c["t"], int) and c["t"] == 0
    assert c["M"] == 1.989e33
    assert len(snap["rlin"]) == 5 and snap["rlin"][0] == -3.086e18


def test_golden_pathological_floats(tmp_path):
    """Float-edge fixture: negative zero, subnormals (5.0e-324 is the
    smallest positive float64), DBL_MAX, NaN/Inf spelled the way Julia's
    string() prints them, 64-bit ints above 2^53, and Julia's shortest
    reprs with uncooperative last digits. Both the reader and a
    write-then-reread round trip must preserve every bit."""
    import os

    path = os.path.join(
        os.path.dirname(__file__), "golden", "pathological_1snap.csv"
    )
    snap = read_snapshot(path)
    pos, vel, K = snap["pos"], snap["vel"], snap["K"]
    assert pos[0, 0] == 0.0 and np.signbit(pos[0, 0])  # -0.0
    assert pos[0, 1] == 5.0e-324  # min subnormal
    assert pos[0, 2] == 1.7976931348623157e308  # DBL_MAX
    assert vel[0, 0] == 2.5e-5
    assert vel[0, 1] == -2.2250738585072014e-308  # -DBL_MIN (normal)
    assert vel[0, 2] == 1.0000000000000002  # 1 + ulp
    assert np.isnan(vel[1, 0])
    assert np.isposinf(vel[1, 1]) and np.isneginf(vel[1, 2])
    assert K[0] == 1.9999999999999998e27
    assert K[1] == 4.9e-324  # parses to the same subnormal as 5.0e-324
    assert pos[2, 0] == 123456.78900000001
    assert pos[2, 2] == 9.999999999999999e15
    assert vel[2, 1] == 0.0 and np.signbit(vel[2, 1])
    assert np.isnan(snap["rho_radial"][0])

    c = snap["constants"]
    assert c["t"] == 1.7976931348623157e308
    assert c["big"] == 9007199254740993 and isinstance(c["big"], int)
    assert c["neg"] == -42 and isinstance(c["neg"], int)
    assert c["tiny"] == 5.0e-324
    assert c["iterID"] == 2147483647

    p2 = write_snapshot(
        "3", "pathological", pos, vel, K=K, constants=c,
        rlin=snap["rlin"], rho_radial=snap["rho_radial"], root=str(tmp_path),
    )
    snap2 = read_snapshot(p2)
    np.testing.assert_array_equal(snap2["pos"], pos)
    np.testing.assert_array_equal(snap2["vel"], vel)
    np.testing.assert_array_equal(snap2["K"], K)
    assert np.signbit(snap2["pos"][0, 0]) and np.signbit(snap2["vel"][2, 1])
    assert snap2["constants"]["big"] == 9007199254740993


def test_stats_mmap_layout(tmp_path):
    """Stats file must be column-major on disk (Julia Matrix layout)."""
    path = str(tmp_path / "stats")
    sf = StatsFile(path)
    row = np.arange(10, dtype=np.float64)
    sf.update_row(1, row)
    sf.update_row(3, row * 2)
    sf.sync()

    raw = np.fromfile(path, dtype=np.float64)
    # column j of the (100000, 10) matrix occupies a contiguous run
    from sphtpu.io import NSTEPS

    for j in range(10):
        assert raw[j * NSTEPS + 0] == row[j]
        assert raw[j * NSTEPS + 2] == row[j] * 2

    hist = sf.up_to(3)
    assert hist.shape == (3, 10)
    np.testing.assert_array_equal(hist[0], row)
    sf.close()

    # reopen appends rather than clobbering
    sf2 = StatsFile(path)
    np.testing.assert_array_equal(sf2.up_to(1)[0], row)
    sf2.close()


def test_stats_bounds(tmp_path):
    sf = StatsFile(str(tmp_path / "stats"))
    with pytest.raises(IndexError):
        sf.update_row(0, np.zeros(10))
    with pytest.raises(IndexError):
        sf.update_row(100001, np.zeros(10))
    sf.close()

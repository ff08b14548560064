import numpy as np
import pytest

from sphtpu import constants as C
from sphtpu.io import read_snapshot
from sphtpu.scenes import DEFAULTS, iniconds_setup
from sphtpu.scenes.setup import IC_TYPES, host_density_at
from sphtpu.units import UnitSystem


def test_defaults_table():
    # spot-check against iniconds.jl:536-566
    assert DEFAULTS["N"] == 10000
    assert DEFAULTS["Kh"] == 50 and DEFAULTS["Kgr"] == 20
    assert DEFAULTS["theta"] == 0.576
    assert DEFAULTS["tEnd"] == 5e12
    assert DEFAULTS["R"] == 2.0 * 5.38552341e16
    assert DEFAULTS["M"] == 1.9891e33
    assert abs(DEFAULTS["gamma"] - 5 / 3) < 1e-15
    assert DEFAULTS["T"] == 15_000_000


@pytest.mark.parametrize("ic_type", IC_TYPES)
def test_generate_all_ics_polytropic(ic_type, tmp_path):
    kwargs = {"N": 300}
    if ic_type == "polytropic_sphere":
        kwargs["K"] = 1e15
    path = iniconds_setup("polytropic", ic_type, root=str(tmp_path), **kwargs)
    snap = read_snapshot(path)
    c = snap["constants"]
    assert snap["pos"].shape == (300, 3)
    assert snap["vel"].shape == (300, 3)
    assert snap["K"] is not None and snap["K"].shape == (300,)
    assert (snap["K"] > 0).all()
    assert c["N"] == 300 and c["iterID"] == 1
    assert "gamma" in c and "cs" not in c
    # R is the max COM distance, in the right ballpark of the input scale
    assert c["R"] > 0
    assert np.isfinite(snap["pos"]).all() and np.isfinite(snap["vel"]).all()
    # m = M/N (or M_actual/N for the polytrope)
    assert abs(c["m"] * 300 - c["M"]) < 1e-6 * abs(c["M"])


def test_generate_isothermal_constants(tmp_path):
    path = iniconds_setup(
        "isothermal", "sample_plummer_sphere", root=str(tmp_path), N=200
    )
    snap = read_snapshot(path)
    c = snap["constants"]
    assert snap["K"] is None  # isothermal snapshots carry no K column
    cs = np.sqrt(C.KB * DEFAULTS["T"] / (DEFAULTS["mu"] * C.MH))
    assert abs(c["cs"] - cs) < 1e-6 * cs
    assert abs(c["U"] - 1.5 * c["M"] * cs**2) < 1e-6 * abs(c["U"])
    assert "gamma" not in c


def test_boss_bodenheimer_rotation():
    from sphtpu.scenes.generators import boss_bodenheimer

    rng = np.random.default_rng(1)
    pos, vel, rho = boss_bodenheimer(2000, 3e17, 2e33, rng=rng)
    # net momentum removed, rotation about z
    assert np.abs(vel.mean(axis=0)).max() < 1e-8 * np.abs(vel).max()
    assert np.abs(vel[:, 2]).max() == 0.0
    lz = (pos[:, 0] * vel[:, 1] - pos[:, 1] * vel[:, 0]).sum()
    assert lz > 0  # prograde
    assert np.allclose(rho, rho[0])
    # inside the cloud radius (a little slack for the COM-centering shift)
    assert np.linalg.norm(pos, axis=1).max() <= 3e17 * 1.05


def test_gaussian_sphere_rotation_axis():
    from sphtpu.scenes.generators import gaussian_sphere

    rng = np.random.default_rng(2)
    pos, vel = gaussian_sphere(500, 1.0, axis=[0.0, 0.0, 1.0], Omega_frac=0.3, rng=rng)
    # v = omega x r about z: vz == 0, v perpendicular to r_xy
    assert np.abs(vel[:, 2]).max() == 0.0
    dots = vel[:, 0] * pos[:, 0] + vel[:, 1] * pos[:, 1]
    assert np.abs(dots).max() < 1e-8 * (np.abs(vel).max() * np.abs(pos).max())
    assert np.abs(pos.mean(axis=0)).max() < 1e-10  # COM-centered


def test_plummer_virial_ballpark():
    from sphtpu.scenes.generators import sample_plummer_sphere

    rng = np.random.default_rng(3)
    M, a = 2e33, 1e17
    pos, vel = sample_plummer_sphere(4000, M, a, rng)
    r = np.linalg.norm(pos, axis=1)
    # half-mass radius of a Plummer sphere is ~1.3 a
    assert 0.8 * a < np.median(r) < 2.5 * a
    v_esc = np.sqrt(2 * C.G_CGS * M / np.sqrt(r**2 + a**2))
    assert (np.linalg.norm(vel, axis=1) <= v_esc).all()


def test_host_density_uniform_sphere():
    """SPH density estimate should recover a uniform-sphere density."""
    rng = np.random.default_rng(4)
    N, R = 8000, 1.0
    u = rng.random(N) ** (1 / 3)
    dirs = rng.standard_normal((N, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pos = (R * u)[:, None] * dirs
    m = 1.0 / N
    rho_true = 1.0 / (4 / 3 * np.pi * R**3)
    rho = host_density_at(m, np.zeros((1, 3)), pos, 50)[0]
    assert abs(rho - rho_true) < 0.25 * rho_true


def test_units_roundtrip():
    u = UnitSystem.from_constants(C.G_CGS, 2e33, 1e17)
    # G = 1 in code units
    assert abs(C.G_CGS * u.M * u.T**2 / u.L**3 - 1.0) < 1e-12
    gamma = 5 / 3
    K_cgs = 1.45e27
    K_code = K_cgs / u.K_entropy(gamma)
    assert abs(K_code * u.K_entropy(gamma) - K_cgs) < 1e-12 * K_cgs
    # cs^2 = gamma K rho^(gamma-1) is unit-consistent
    rho_cgs = 1e-18
    cs2_cgs = gamma * K_cgs * rho_cgs ** (gamma - 1)
    cs2_code = gamma * K_code * (rho_cgs / u.RHO) ** (gamma - 1)
    assert abs(cs2_code * u.V**2 - cs2_cgs) < 1e-9 * cs2_cgs

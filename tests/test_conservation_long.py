"""Long-horizon conservation: hundreds of steps, drift pinned (VERDICT r1
item 3's automated piece).

The hydrostatic configuration is the index-n polytrope (Lane-Emden
equilibrium, iniconds.jl:342-415): pressure balances gravity, so the
engine should hold it — total energy drift over hundreds of KDK steps is
the regression signal (the reference's own validation is exactly this
conservation dashboard, polytrope_sim.jl:177-205).

Also pins the f32 (TPU production dtype) against the f64 lane on the same
horizon: precision error must stay well below the scheme error.
"""

import numpy as np

import jax.numpy as jnp
from scipy.spatial import cKDTree

from sphtpu import constants as C
from sphtpu.engine import EngineConfig, Params, State, make_chunk_runner
from sphtpu.scenes.generators import polytropic_sphere
from sphtpu.units import UnitSystem

N = 1000
KH = 16
STEPS = 200
CHUNK = 40


def _build(dtype):
    rng = np.random.default_rng(11)
    # n=1.5 -> gamma=5/3: a dynamically STABLE polytrope (n=3/gamma=4/3 is
    # marginally stable and drifts violently); first Lane-Emden zero at
    # xi ~= 3.654
    pos, vel, M = polytropic_sphere(
        N, n=1.5, K=1e15, rho_c=150.0, xi_max=3.6, rng=rng
    )
    R = float(np.linalg.norm(pos, axis=1).max())
    u = UnitSystem.from_constants(C.G_CGS, M, R)
    jd = jnp.dtype(dtype)
    gamma = 1.0 + 1.0 / 1.5
    K_code = 1e15 / u.K_entropy(gamma)
    pos_code = pos / u.L
    h0 = cKDTree(pos_code).query(pos_code, k=KH)[0][:, -1] / 2.0
    params = Params(
        m=jnp.asarray(M / N / u.M, jd),
        gamma=jnp.asarray(gamma, jd),
        cs0=jnp.asarray(0.0, jd),
        alpha=jnp.asarray(1.0, jd),
        beta=jnp.asarray(2.0, jd),
        U0=jnp.asarray(0.0, jd),
        t_end=jnp.asarray(1e9, jd),
    )
    state = State(
        pos=jnp.asarray(pos_code, jd),
        vel=jnp.asarray(vel / u.V, jd),
        K=jnp.asarray(np.full(N, K_code), jd),
        t=jnp.asarray(0.0, jd),
    )
    return state, params, pos_code, h0


def _run(dtype):
    state, params, pos_code, h0 = _build(dtype)
    h_host = h0.copy()
    E = []
    ang = []
    n_fb = 0
    h_dev = jnp.asarray(h_host, jnp.dtype(dtype))
    # gather engine: oracle-identical physics (tile == gather is pinned in
    # test_tiles/test_shard_tiles) at a per-pass cost this single-core CI
    # box can afford over hundreds of steps; ONE compile per dtype
    cfg = EngineConfig(n=N, kh=KH, eos="polytropic", dtype=dtype)
    chunk = make_chunk_runner(cfg)
    for _ in range(STEPS // CHUNK):
        state, stats, valid, h_dev, _, nfb = chunk(
            state, params, h_dev, n_steps=CHUNK
        )
        assert bool(np.asarray(valid).all())
        n_fb += int(np.asarray(nfb).sum())
        h_host = np.asarray(h_dev, np.float64)
        stats = np.asarray(stats, np.float64)
        E.extend(stats[:, 4].tolist())
        ang.extend(stats[:, 9].tolist())
    return np.array(E), np.array(ang), n_fb


def test_long_horizon_drift_f64():
    """200 steps of the n=1.5 polytrope, f64.

    The Poisson-sampled profile virializes with ~0.1%/step secular energy
    drift — that is the KDK + 0.3-factor adaptive-dt scheme itself (the
    reference's integrator, polytrope_sim.jl:165-227), measured at 0.205
    over this horizon; the bound pins regressions (a sign/pairing bug
    blows through it immediately). Angular momentum, conserved exactly by
    the symmetric pair force, is pinned at roundoff."""
    E, ang, n_fb = _run("float64")
    drift = np.abs((E - E[0]) / E[0]).max()
    assert drift < 0.35, drift
    assert drift > 1e-6  # the run actually went somewhere
    # non-rotating IC: |L| stays at accumulation roundoff
    assert np.abs(ang).max() < 1e-12


def test_f32_tracks_f64_long_horizon():
    """The f32 production dtype tracks the f64 energy trajectory: the
    precision error stays an order below the (already small) scheme
    drift."""
    E64, _, _ = _run("float64")
    E32, _, _ = _run("float32")
    rel = np.abs((E32 - E64) / E64)
    assert rel.max() < 2e-4, rel.max()

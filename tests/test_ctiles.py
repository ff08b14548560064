"""Class-compacted tile engine vs the gather engine: identical physics.

The class path only removes padded QUERY rows from the sweep (candidates
stay the full 27-cell prestack), so at f64 its outputs must match the
mono-tile engine — and hence the gather oracle — to reduction-order
roundoff. Kernels run in Pallas interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from sphtpu.physics import sph_forces
from sphtpu.physics.ctiles import choose_tile_classes, ctile_sph_forces


def _two_scale_ball(n, seed=0):
    """Mildly contrasted ball so the occupancy classes are non-trivial."""
    rng = np.random.default_rng(seed)
    n_core = n // 3
    u = rng.random(n) ** (1 / 3)
    u[:n_core] *= 0.6  # denser core: several occupancy classes
    dirs = rng.standard_normal((n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pos = u[:, None] * dirs
    vel = 0.3 * rng.standard_normal((n, 3))
    return pos, vel


@pytest.mark.parametrize("eos", ["polytropic", "isothermal"])
def test_ctiles_match_gather_engine(eos):
    n, kh = 4000, 16
    pos, vel = _two_scale_ball(n)
    d, _ = cKDTree(pos).query(pos, k=kh)
    h_true = d[:, -1] / 2
    plan = choose_tile_classes(pos, h_true, kh)
    assert plan is not None
    g, cap, classes = plan
    assert len(classes) >= 2, "fixture must exercise several classes"
    K = 1.0 + 0.2 * np.random.default_rng(1).random(n)
    kw = dict(gamma=5 / 3, cs0=0.6, alpha=1.0, beta=2.0, kh=kh)
    m = 1.0 / n

    ref = sph_forces(
        jnp.asarray(pos), jnp.asarray(vel), m, jnp.asarray(K), eos=eos, **kw
    )
    out, gcorr, ok = ctile_sph_forces(
        jnp.asarray(pos),
        jnp.asarray(vel),
        m,
        jnp.asarray(K),
        jnp.asarray(h_true),
        eos=eos,
        grid=g,
        cap=cap,
        classes=classes,
        interpret=True,
        **kw,
    )
    assert bool(ok), f"class engine failed certification at grid={g}"

    np.testing.assert_allclose(np.asarray(out.h), np.asarray(ref.h), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(out.rho), np.asarray(ref.rho), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out.cs), np.asarray(ref.cs), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out.acc), np.asarray(ref.acc), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out.mu_max), np.asarray(ref.mu_max), rtol=1e-10, atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(out.div_sum), np.asarray(ref.div_sum), rtol=1e-9, atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(out.visc_dk), np.asarray(ref.visc_dk), rtol=1e-8, atol=1e-15
    )

    # gravity split: Newtonian sweep + class-tile correction == softened
    from sphtpu.physics import gravity_allpairs, gravity_newton_allpairs

    g_soft, phi_soft = gravity_allpairs(jnp.asarray(pos), out.h, m)
    g_newt, phi_newt = gravity_newton_allpairs(jnp.asarray(pos), m)
    g_split = np.asarray(g_newt) + np.stack(
        [np.asarray(x) for x in gcorr[:3]], 1
    )
    phi_split = np.asarray(phi_newt) + np.asarray(gcorr[3])
    np.testing.assert_allclose(
        g_split, np.asarray(g_soft), rtol=1e-9,
        atol=1e-11 * np.abs(np.asarray(g_soft)).max(),
    )
    np.testing.assert_allclose(phi_split, np.asarray(phi_soft), rtol=1e-10)


def test_ctiles_class_overflow_fails_cert():
    """A plan whose class counts no longer fit the state must report
    ok=False, never wrong numbers."""
    n, kh = 1500, 12
    pos, vel = _two_scale_ball(n, seed=2)
    d, _ = cKDTree(pos).query(pos, k=kh)
    h_true = d[:, -1] / 2
    plan = choose_tile_classes(pos, h_true, kh)
    assert plan is not None
    g, cap, classes = plan
    # strangle every class list to the minimum: counts cannot fit
    starved = tuple((ck, 8) for ck, _ in classes)
    _, _, ok = ctile_sph_forces(
        jnp.asarray(pos), jnp.asarray(vel), 1.0 / n, jnp.ones(n),
        jnp.asarray(h_true), eos="polytropic", gamma=5 / 3, cs0=0.0,
        alpha=1.0, beta=2.0, kh=kh, grid=g, cap=cap, classes=starved,
        interpret=True,
    )
    assert not bool(ok)


def test_ctiles_chunk_runner_matches_legacy():
    """The class path wired through EngineConfig/make_chunk_runner steps
    the same trajectory as the legacy tile config at f64."""
    import dataclasses

    from sphtpu.engine import EngineConfig, Params, State, make_chunk_runner
    from sphtpu.physics.tiles import choose_tile_params

    n, kh = 1500, 12
    pos, vel = _two_scale_ball(n, seed=4)
    d, _ = cKDTree(pos).query(pos, k=kh)
    h0 = d[:, -1] / 2
    plan = choose_tile_classes(pos, h0, kh)
    assert plan is not None
    g, cap, classes = plan
    jd = jnp.float64
    params = Params(
        m=jnp.asarray(1.0 / n, jd), gamma=jnp.asarray(5 / 3, jd),
        cs0=jnp.asarray(0.0, jd), alpha=jnp.asarray(1.0, jd),
        beta=jnp.asarray(2.0, jd), U0=jnp.asarray(0.0, jd),
        t_end=jnp.asarray(1e9, jd),
    )
    state = State(
        pos=jnp.asarray(pos, jd), vel=jnp.asarray(vel, jd),
        K=jnp.asarray(np.ones(n), jd), t=jnp.asarray(0.0, jd),
    )
    cfg_c = EngineConfig(
        n=n, kh=kh, eos="polytropic", dtype="float64",
        tile=(g, cap), tile_classes=classes, gravity="exact",
    )
    tile_legacy = choose_tile_params(pos, h0, kh)
    cfg_t = dataclasses.replace(
        cfg_c, tile=tile_legacy, tile_classes=None, pallas_a=False
    )
    out_c = make_chunk_runner(cfg_c)(
        state, params, jnp.asarray(h0, jd), n_steps=2
    )
    out_t = make_chunk_runner(cfg_t)(
        state, params, jnp.asarray(h0, jd), n_steps=2
    )
    assert int(np.asarray(out_c[5]).sum()) == 0, "no fallbacks expected"
    assert int(np.asarray(out_t[5]).sum()) == 0
    np.testing.assert_allclose(
        np.asarray(out_c[0].pos), np.asarray(out_t[0].pos),
        rtol=0, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(out_c[1]), np.asarray(out_t[1]), rtol=1e-8, atol=1e-12
    )

"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh: the sharded
step must agree with the single-device step to float tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sphtpu.engine import EngineConfig, Params, State, make_chunk_runner
from sphtpu.shard import make_sharded_chunk_runner, particle_mesh, shard_state


def _setup(eos, n=256, dtype="float64", seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.standard_normal((n, 3))
    vel = 0.1 * rng.standard_normal((n, 3))
    K = 1.0 + 0.1 * rng.random(n)
    jd = jnp.dtype(dtype)
    cfg = EngineConfig(n=n, kh=16, eos=eos, dtype=dtype)
    params = Params(
        m=jnp.asarray(1.0 / n, jd),
        gamma=jnp.asarray(5.0 / 3.0, jd),
        cs0=jnp.asarray(0.5, jd),
        alpha=jnp.asarray(1.0, jd),
        beta=jnp.asarray(2.0, jd),
        U0=jnp.asarray(1.0, jd),
        t_end=jnp.asarray(1e9, jd),
    )
    state = State(
        pos=jnp.asarray(pos, jd),
        vel=jnp.asarray(vel, jd),
        K=jnp.asarray(K, jd),
        t=jnp.asarray(0.0, jd),
    )
    return cfg, params, state


@pytest.mark.parametrize("eos", ["polytropic", "isothermal"])
def test_sharded_matches_unsharded(eos):
    cfg, params, state = _setup(eos)
    mesh = particle_mesh(jax.devices()[:8])

    single = make_chunk_runner(cfg)
    h0 = jnp.zeros((cfg.n,), state.pos.dtype)
    st1, stats1, valid1, _, _, _ = single(state, params, h0, n_steps=3)

    sharded = make_sharded_chunk_runner(cfg, mesh)
    st8, stats8, valid8 = sharded(shard_state(state, mesh), params, n_steps=3)

    assert np.asarray(valid8).all()
    np.testing.assert_allclose(
        np.asarray(stats8), np.asarray(stats1), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(st8.pos), np.asarray(st1.pos), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(st8.vel), np.asarray(st1.vel), rtol=1e-8, atol=1e-12
    )
    if eos == "polytropic":
        np.testing.assert_allclose(
            np.asarray(st8.K), np.asarray(st1.K), rtol=1e-9
        )


def test_sharded_layout_and_tend_freeze():
    cfg, params, state = _setup("polytropic")
    mesh = particle_mesh(jax.devices()[:8])
    params = params._replace(t_end=jnp.asarray(0.0, jnp.float64))
    sharded = make_sharded_chunk_runner(cfg, mesh)
    st, stats, valid = sharded(shard_state(state, mesh), params, n_steps=2)
    assert not np.asarray(valid).any()  # frozen at t_end
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(state.pos))
    # output keeps the row-sharded layout
    shard_sizes = {s.data.shape[0] for s in st.pos.addressable_shards}
    assert shard_sizes == {cfg.n // 8}


def test_mesh_divisibility_guard():
    cfg = EngineConfig(n=250, kh=8, eos="isothermal")
    mesh = particle_mesh(jax.devices()[:8])
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_chunk_runner(cfg, mesh)

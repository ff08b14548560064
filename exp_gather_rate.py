"""Measure TPU gather/scatter formulations for the block engine's
candidate prestacks (dev experiment, not part of the suite).

Hypothesis: phase B's 11 per-field gathers + 8 per-field scatter-adds over
~4.3M candidate slots dominate the deep-regime force pass; packing fields
into rows and gathering/scattering (rows, width) blocks amortizes the
per-row descriptor cost.

Usage: python exp_gather_rate.py [n_idx_millions]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(label, fn, reps=6):
    fn()  # compile
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.time() - t0) / reps
    print(f"{label:44s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    n = 100_001
    n_idx = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 4_300_000
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, n_idx), jnp.int32)
    fields = [jnp.asarray(rng.random(n), jnp.float32) for _ in range(11)]
    packed16 = jnp.stack(fields + fields[:5], axis=1)  # (n, 16)
    vals8 = [jnp.asarray(rng.random(n_idx), jnp.float32) for _ in range(8)]
    packed_v8 = jnp.stack(vals8, axis=1)  # (n_idx, 8)

    @jax.jit
    def gather_separate():
        return [f[idx] for f in fields]

    @jax.jit
    def gather_packed16():
        return packed16[idx]

    @jax.jit
    def scatter_separate():
        return [jnp.zeros((n,), jnp.float32).at[idx].add(v) for v in vals8]

    @jax.jit
    def scatter_packed8():
        return jnp.zeros((n, 8), jnp.float32).at[idx].add(packed_v8)

    print(f"n_idx={n_idx/1e6:.1f}M backend={jax.default_backend()}")
    t1 = timeit("gather 11 separate fields", gather_separate)
    t2 = timeit("gather packed (n,16) rows", gather_packed16)
    t3 = timeit("scatter-add 8 separate fields", scatter_separate)
    t4 = timeit("scatter-add packed (n_idx,8) rows", scatter_packed8)
    print(f"gather speedup x{t1 / t2:.2f}  scatter speedup x{t3 / t4:.2f}")
    print(f"elem rates: sep gather {11 * n_idx / t1 / 1e6:.0f}M/s, "
          f"packed {16 * n_idx / t2 / 1e6:.0f}M/s, "
          f"sep scatter {8 * n_idx / t3 / 1e6:.0f}M/s, "
          f"packed {8 * n_idx / t4 / 1e6:.0f}M/s")


if __name__ == "__main__":
    main()

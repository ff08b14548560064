"""Microbenchmark the block engine's two Pallas kernels in isolation.

Round-4 finding driver: the hard-regime force pass runs ~80x below the
VPU roof (roofline.py says phase A ~66 GFLOP in ~0.5 s, phase B ~68
GFLOP in ~0.44 s, while the XLA all-pairs gravity sweep hits 1.1
TFLOP/s on the same chip). This times each kernel per bucket shape of
the deep-collapse spec to locate the loss: per-grid-step overhead
(many small steps), layout (the (cap, 1) query columns), or in-body
serialization (bisection fori_loop / transcendentals).

Usage: python profile_kernels.py [a|b|both] — prints one line per
bucket shape: ms, GFLOP/s, grid steps, us/step.
"""

import sys
import time

import numpy as np

import sphtpu  # noqa: F401  (persistent compile cache)
import jax
import jax.numpy as jnp

# the deep-collapse fixture's spec shape (BENCH_r03/r04 hard lane)
BUCKETS = (
    (512, 8), (768, 8), (1024, 8), (1536, 8), (2048, 16), (3072, 352),
    (4096, 216), (6144, 144), (8192, 40), (12288, 24), (16384, 16),
    (24576, 8), (32768, 16),
)
BQ = 128
KH = 50


def rnd(shape, lo=0.0, hi=1.0, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(lo, hi, shape), jnp.float32
    )


def _fetch(out):
    # jax.block_until_ready does NOT synchronize on the axon backend
    # (see .claude/skills/verify) — sync via a scalar fetch instead;
    # reduce on-device first so the tunnel moves one float, not MBs
    s = sum(leaf.ravel()[0] for leaf in jax.tree.leaves(out))
    float(s)


def time_it(fn, *args, iters=8, **kw):
    _fetch(fn(*args, **kw))
    t0 = time.time()
    for _ in range(iters):
        _fetch(fn(*args, **kw))
    return (time.time() - t0) / iters


def bench_a():
    from sphtpu.kernels.pallas_strip_knn import phase_a_cells

    print("--- phase A (pallas_strip_knn.phase_a_cells) ---", flush=True)
    tot = 0.0
    for cb, nb in BUCKETS:
        q = tuple(rnd((nb, BQ), seed=s) for s in range(3)) + (
            jnp.ones((nb, BQ), jnp.float32),
        )
        reach2 = jnp.full((nb, BQ), 3.0, jnp.float32)
        c = tuple(rnd((nb, cb), seed=s + 7) for s in range(3)) + (
            jnp.ones((nb, cb), jnp.float32),
        )
        dt = time_it(
            phase_a_cells, q, reach2, c, 1.0, kh=KH, cap=BQ, n_bisect=28
        )
        slots = nb * BQ * cb
        fl = slots * (8 + 3 * 28 + 5 + 24)
        # qb replicates the kernel's VMEM sizing rule
        limit = max(312_498 // cb, 8)
        qb = max(d for d in range(8, BQ + 1, 8) if BQ % d == 0 and d <= limit)
        steps = nb * (BQ // qb)
        print(
            f"A cb={cb:6d} nb={nb:4d}: {dt * 1e3:8.2f} ms  "
            f"{fl / dt / 1e9:7.1f} GFLOP/s  steps={steps:5d}  "
            f"{dt / steps * 1e6:7.1f} us/step",
            flush=True,
        )
        tot += dt
    print(f"A total: {tot * 1e3:.1f} ms", flush=True)


def bench_b():
    from sphtpu.kernels.pallas_block_pairs import phase_b_blocks

    print("--- phase B (pallas_block_pairs.phase_b_blocks) ---", flush=True)
    tot = 0.0
    for cb, nb in BUCKETS:
        qf = tuple(rnd((nb, BQ), seed=s) for s in range(11))
        cf = tuple(rnd((nb, cb), seed=s + 13) for s in range(10))
        dt = time_it(
            phase_b_blocks, qf, cf, 1.0, 1.0, 2.0, 1.0, 0.1,
            eos="polytropic", p3m=False, cap=BQ,
        )
        slots = nb * BQ * cb
        fl = slots * 125
        k = -(-cb // 2048)
        cwc = cb // k
        limit = max(107_000 // cwc, 8)
        qb = max(d for d in range(8, BQ + 1, 8) if BQ % d == 0 and d <= limit)
        steps = k * nb * (BQ // qb)
        print(
            f"B cb={cb:6d} nb={nb:4d}: {dt * 1e3:8.2f} ms  "
            f"{fl / dt / 1e9:7.1f} GFLOP/s  steps={steps:5d}  "
            f"{dt / steps * 1e6:7.1f} us/step",
            flush=True,
        )
        tot += dt
    print(f"B total: {tot * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    print(f"backend={jax.default_backend()}", flush=True)
    if which in ("a", "both"):
        bench_a()
    if which in ("b", "both"):
        bench_b()

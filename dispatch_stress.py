"""Minimized repro for the long-dispatch TPU-worker crash (VERDICT r3
weak-4 / ROADMAP scan-length anomaly).

Observed in production: 20-step scan chunks of the hard-regime engine
(~41 s device time per dispatch) reproducibly kill the TPU worker, and
4-step chunks at N=2e6 (~90 s) do too, while 10-step chunks (~21 s) are
stable. Hypothesis: the failure is NOT in the SPH program at all — any
single dispatch whose device wall-clock exceeds a watchdog threshold on
the axon tunnel dies. This script tests exactly that with a trivial
program (a fori_loop of (4096, 4096) f32 matmuls — no scatters, no
Pallas, no scan-carried state, constant memory).

Usage:
    python dispatch_stress.py calibrate     # measure s per 1000 matmuls
    python dispatch_stress.py run T [T...]  # one dispatch of ~T seconds each

The matmul count for a target T comes from the calibrate step. Each run
prints the achieved device seconds (timed via scalar fetch) or the crash
traceback — bisect T by hand between the last-good and first-dead
values. Results recorded in BASELINE.md ("Long-dispatch fault").
"""

import sys
import time

import numpy as np

import sphtpu  # noqa: F401  (enables the persistent compile cache)
import jax
import jax.numpy as jnp
from jax import lax


D = 4096


@jax.jit
def burn(x, iters):
    def body(_, acc):
        # data-dependent chain so XLA cannot collapse the loop
        return acc @ x * (1.0 / D)

    return lax.fori_loop(0, iters, body, x)[0, 0]


def one_dispatch(iters):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((D, D)), jnp.float32)
    t0 = time.time()
    v = float(burn(x, jnp.asarray(iters, jnp.int32)))
    dt = time.time() - t0
    return v, dt


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "calibrate"
    print(f"backend={jax.default_backend()}", flush=True)
    if mode == "calibrate":
        t0 = time.time()
        one_dispatch(10)  # compile
        print(f"compile+warm: {time.time() - t0:.1f}s", flush=True)
        for iters in (1000, 2000):
            v, dt = one_dispatch(iters)
            print(f"iters={iters}: {dt:.2f}s wall ({dt / iters * 1e3:.3f} ms/iter)",
                  flush=True)
    else:
        # calibrated on this chip: ~0.32 ms per 4096^3 matmul iter
        ms_per_iter = float(sys.argv[2]) if len(sys.argv) > 3 else 0.32
        one_dispatch(10)  # compile outside the timed/long dispatch
        for t_target in [float(a) for a in sys.argv[2:]]:
            iters = int(t_target * 1e3 / ms_per_iter)
            print(f"--- target {t_target:.0f}s ({iters} iters) ---", flush=True)
            try:
                v, dt = one_dispatch(iters)
                print(f"OK: {dt:.1f}s wall, value={v:.3e}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"DEAD at target {t_target:.0f}s: {type(e).__name__}: {e}",
                      flush=True)
                raise


if __name__ == "__main__":
    main()

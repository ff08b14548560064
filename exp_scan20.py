"""Probe the folklore MAX_SCAN_STEPS=10 cap (VERDICT r4 next-9).

History: with per-length compiled programs, 20-step scans at N=1e5
reproducibly crashed the TPU worker at ~16 s of wall — BELOW the ~55 s
dispatch watchdog that round 4's dispatch_stress.py established as the
other failure mode. Round 5's chunk runner compiles ONE program per
config (static scan_length, traced active-step count), so the probe
re-tests the exact crash condition on the new program structure:
scan_length 20 and 40 at the headline N=1e5 config, three dispatches
each (40 steps ~ 15 s wall on the class-compacted engine — the original
crash's wall neighborhood).

Usage: python exp_scan20.py
"""

import time

import numpy as np

import jax

from bench import build_state, fetch


def main():
    from sphtpu.engine import make_chunk_runner

    cfg, params, state, h0 = build_state()
    chunk = make_chunk_runner(cfg)
    for scan_len in (20, 40):
        t0 = time.time()
        st, stats, valid, h_w, _, nfb = chunk(
            state, params, h0, n_steps=scan_len, scan_length=scan_len
        )
        fetch((stats, valid, nfb))
        print(
            f"scan_length={scan_len}: compile+warm dispatch OK "
            f"({time.time() - t0:.1f}s)", flush=True,
        )
        for rep in range(3):
            t0 = time.time()
            st, stats, valid, h_w, _, nfb = chunk(
                st, params, h_w, n_steps=scan_len, scan_length=scan_len
            )
            fetch((stats, valid, nfb))
            assert bool(np.asarray(valid).all())
            print(
                f"scan_length={scan_len} rep {rep}: {time.time() - t0:.1f}s "
                f"wall, all {scan_len} steps valid", flush=True,
            )
    print("PROBE PASSED: no worker crash at 20- or 40-step scans")


if __name__ == "__main__":
    main()

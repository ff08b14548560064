"""Build bench_data/bb_collapsed.npz from a deep-collapse checkpoint.

Usage: python make_hard_fixture.py <ckpt.npz> <contrast>

The fixture feeds bench.py's hard-regime measurement (VERDICT r1 item 7):
a warm restart from a partially-collapsed Boss-Bodenheimer state, where
tile certification is actually stressed. Stored f32 to keep the committed
file small; m is the code-unit particle mass of the producing run.
"""

import os
import sys

import numpy as np

from sphtpu import constants as C
from sphtpu.scenes.setup import DEFAULTS
from sphtpu.units import UnitSystem

ckpt = sys.argv[1]
contrast = float(sys.argv[2])

d = np.load(ckpt)
n = d["pos"].shape[0]
u = UnitSystem.from_constants(C.G_CGS, DEFAULTS["M"], DEFAULTS["R"])
m_code = DEFAULTS["M"] / n / u.M

os.makedirs("bench_data", exist_ok=True)
np.savez_compressed(
    "bench_data/bb_collapsed.npz",
    pos=d["pos"].astype(np.float32),
    vel=d["vel"].astype(np.float32),
    K=d["K"].astype(np.float32),
    h=d["h"].astype(np.float32),
    t=float(d["t"]),
    m=m_code,
    contrast=contrast,
    note=(
        "cold (T=10K) boss_bodenheimer N=%d driven to density contrast "
        "%.0f by collapse_run.py (code units, G=1, unit R=%.4g cm, "
        "M=%.4g g)" % (n, contrast, u.L, u.M)
    ),
)
print(
    "wrote bench_data/bb_collapsed.npz:",
    os.path.getsize("bench_data/bb_collapsed.npz"), "bytes, N =", n,
    "t =", float(d["t"]), "contrast =", contrast,
)

"""Reference-compatible CSV snapshot codec.

File grammar (reference: fastv1_kd&single_oc/SnapshotRW.jl:22-159):

    header: type,x,y,z,vx,vy,vz,K,rlin,rho_radial,constants
    N rows  type="particle" with x..vz (and K for polytropic runs)
    0/1 row type="rlin"        rlin column  = ";"-joined float vector
    0/1 row type="rho_radial"  rho_radial   = ";"-joined float vector
    0/1 row type="constants"   constants    = "k=v;k=v;..." row

Missing cells are empty strings. Constants values are sniffed back as Int
unless they contain ``[eE.]`` (SnapshotRW.jl:147) — the writer therefore
keeps integers dot-free and floats with a '.' or exponent so both this codec
and the Julia reader agree on types. Paths follow the reference scheme
``<root>/snapshots/<ic_type>/bin/<ID>snap.csv`` (SnapshotRW.jl:99); unlike
the reference (README.md:41-53 asks the user to pre-create folders) the
directories are created on demand.

Everything here is host-side float64 CGS, matching the on-disk contract of
the reference.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import numpy as np

_FLOAT_RE = re.compile(r"[eE.]")

COLUMNS = (
    "type",
    "x",
    "y",
    "z",
    "vx",
    "vy",
    "vz",
    "K",
    "rlin",
    "rho_radial",
    "constants",
)


def _fmt_num(v) -> str:
    """Format a number the way Julia's string() does, close enough to
    round-trip through both this codec and Julia's CSV.read.

    Integers print without a decimal point (so the reference's int-vs-float
    sniffing keeps them Int); floats keep a '.' or exponent. Exponents drop
    the '+' and leading zeros ("1.5e+16" -> "1.5e16") like Julia.
    """
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    x = float(v)
    if x != x:
        return "NaN"
    if x in (float("inf"), float("-inf")):
        return "Inf" if x > 0 else "-Inf"
    if x == int(x) and abs(x) < 1e15:
        # Julia prints e.g. 5.0, 100000.0 for integral floats below its
        # scientific-notation threshold.
        r = repr(x)
    else:
        r = repr(x)
    if "e" in r:
        mant, exp = r.split("e")
        if "." not in mant:
            mant += ".0"
        return f"{mant}e{int(exp)}"
    return r


def snapshot_path(root: str, ic_type: str, snap_id: str) -> str:
    return os.path.join(root, "snapshots", ic_type, "bin", f"{snap_id}snap.csv")


def write_snapshot(
    snap_id: str,
    ic_type: str,
    pos: np.ndarray,
    vel: np.ndarray,
    *,
    K: Optional[np.ndarray] = None,
    constants: Optional[Dict] = None,
    rlin: Optional[np.ndarray] = None,
    rho_radial: Optional[np.ndarray] = None,
    root: str = ".",
) -> str:
    """Write a snapshot CSV; returns the path written.

    Mirrors SnapshotRW.write_snapshot (SnapshotRW.jl:22-109). PNG figure
    saving lives in sphtpu.viz instead of here.
    """
    pos = np.asarray(pos, dtype=np.float64)
    vel = np.asarray(vel, dtype=np.float64)
    n = pos.shape[0]
    path = snapshot_path(root, ic_type, str(snap_id))
    os.makedirs(os.path.dirname(path), exist_ok=True)

    kcol = None
    if K is not None:
        kcol = np.asarray(K, dtype=np.float64)
        if kcol.shape != (n,):
            raise ValueError(f"K must have shape ({n},), got {kcol.shape}")

    lines = [",".join(COLUMNS)]
    empty_tail = ",,,"  # K,rlin,rho_radial,constants all missing
    for i in range(n):
        nums = (
            _fmt_num(pos[i, 0]),
            _fmt_num(pos[i, 1]),
            _fmt_num(pos[i, 2]),
            _fmt_num(vel[i, 0]),
            _fmt_num(vel[i, 1]),
            _fmt_num(vel[i, 2]),
        )
        k = _fmt_num(kcol[i]) if kcol is not None else ""
        lines.append(f"particle,{','.join(nums)},{k},,,")

    if rlin is not None and len(rlin) > 0:
        ser = ";".join(_fmt_num(v) for v in np.asarray(rlin, dtype=np.float64))
        lines.append(f"rlin,,,,,,,,{ser},,")
    if rho_radial is not None and len(rho_radial) > 0:
        ser = ";".join(_fmt_num(v) for v in np.asarray(rho_radial, dtype=np.float64))
        lines.append(f"rho_radial,,,,,,,,,{ser},")
    if constants:
        ser = ";".join(f"{k}={_fmt_num(v)}" for k, v in constants.items())
        lines.append(f"constants,,,,,,,,,,{ser}")

    with open(path, "w") as f:
        f.write("\n".join(lines))
        f.write("\n")
    return path


def _parse_const(v: str):
    """Int-vs-float sniffing identical to SnapshotRW.jl:147."""
    return float(v) if _FLOAT_RE.search(v) else int(v)


def read_snapshot(path: str) -> Dict:
    """Read a snapshot CSV (ours or a reference-generated one).

    Returns dict with keys pos (N,3), vel (N,3), K ((N,) or None), rlin,
    rho_radial (float64 arrays, possibly empty), constants (dict).
    Mirrors SnapshotRW.read_snapshot (SnapshotRW.jl:123-159).
    """
    pos_rows, vel_rows, k_rows = [], [], []
    rlin = np.empty(0)
    rho_radial = np.empty(0)
    constants: Dict = {}

    with open(path, "r") as f:
        header = f.readline().strip().split(",")
        idx = {name: i for i, name in enumerate(header)}
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            cells = line.split(",")
            row_type = cells[idx["type"]]
            if row_type == "particle":
                pos_rows.append(
                    (cells[idx["x"]], cells[idx["y"]], cells[idx["z"]])
                )
                vel_rows.append(
                    (cells[idx["vx"]], cells[idx["vy"]], cells[idx["vz"]])
                )
                kcell = cells[idx["K"]] if "K" in idx else ""
                k_rows.append(float(kcell) if kcell != "" else np.nan)
            elif row_type == "rlin":
                rlin = np.array(
                    [float(v) for v in cells[idx["rlin"]].split(";")], dtype=np.float64
                )
            elif row_type == "rho_radial":
                rho_radial = np.array(
                    [float(v) for v in cells[idx["rho_radial"]].split(";")],
                    dtype=np.float64,
                )
            elif row_type == "constants":
                for pair in cells[idx["constants"]].split(";"):
                    k, v = pair.split("=", 1)
                    constants[k] = _parse_const(v)

    pos = np.array(pos_rows, dtype=np.float64)
    vel = np.array(vel_rows, dtype=np.float64)
    karr = np.array(k_rows, dtype=np.float64)
    K = None if np.isnan(karr).all() else karr
    return {
        "pos": pos,
        "vel": vel,
        "K": K,
        "rlin": rlin,
        "rho_radial": rho_radial,
        "constants": constants,
    }

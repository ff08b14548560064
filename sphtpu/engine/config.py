"""Engine configuration and simulation state pytrees.

Static shape/EOS info lives in EngineConfig (changing it recompiles);
physics scalars live in Params as traced values (changing them does not).
All Params/State values are in code units (G = 1, see sphtpu.units).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    n: int  # particle count
    kh: int  # hydro neighbor count (constants "Kh")
    eos: str  # "polytropic" | "isothermal"
    dtype: str = "float32"
    # masked cell-tile fast path: (grid, cap, window, zchunk) or None for
    # the gather engine only. The driver re-chooses this per chunk from the
    # evolving smoothing lengths (each distinct tuple compiles once).
    tile: tuple = None

    def __post_init__(self):
        if self.eos not in ("polytropic", "isothermal"):
            raise ValueError(f"unknown EOS {self.eos!r}")

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


class Params(NamedTuple):
    """Traced physics scalars, code units."""

    m: jnp.ndarray  # particle mass
    gamma: jnp.ndarray  # adiabatic index (unused for isothermal)
    cs0: jnp.ndarray  # isothermal sound speed (unused for polytropic)
    alpha: jnp.ndarray  # AV bulk viscosity
    beta: jnp.ndarray  # AV interpenetration
    U0: jnp.ndarray  # constant internal energy (isothermal diagnostics)
    t_end: jnp.ndarray  # simulation end time


class State(NamedTuple):
    """Loop-carried simulation state, code units."""

    pos: jnp.ndarray  # (N, 3)
    vel: jnp.ndarray  # (N, 3)
    K: jnp.ndarray  # (N,) per-particle entropy (zeros for isothermal)
    t: jnp.ndarray  # scalar time

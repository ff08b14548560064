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
    # far-field gravity on the tile path: "exact" = softened all-pairs
    # sweep (O(N^2), bit-matches the oracle); "p3m" = FFT particle-mesh +
    # in-tile 5^3 pair correction (O(N + Gm^3 log Gm), measured force error
    # below the reference's theta=0.576 octree walk). The gather fallback
    # path is always exact.
    gravity: str = "exact"
    # P3M knobs: mesh cells per tile cell and Gaussian width in mesh cells
    # (tuned in tests/test_mesh_gravity.py). The mesh machinery error is
    # set by sigma in MESH cells (halving sigma_cells doubles it, measured)
    # while the pair-correction cost is set by the stencil the Gaussian
    # tail demands in TILE cells: reach = 4.4 sigma = 4.4 * sigma_cells /
    # mesh_factor tile cells -> c_halfwidth. mesh_factor = 10 shrinks the
    # correction to a 3^3 stencil but the 8x-larger FFT was MEASURED
    # slower on the chip (0.53 s vs 0.09 s per solve at grid 26; pad 512
    # OOMs HBM), so 5 (5^3 stencil, the correction bucketed per strip)
    # stays the default.
    mesh_factor: int = 5
    sigma_cells: float = 2.2
    # VMEM-resident Pallas phase A (kernels/pallas_knn.py). None = use it
    # on TPU backends (the XLA formulation stays for CPU tests and as the
    # reference implementation).
    pallas_a: bool = None
    # outlier-lane row budget (physics/outliers.py): rows whose h cannot
    # certify on the tile grid take an exact O(B*N) lane, letting the grid
    # track the dense bulk through gravitational collapse. 0 = mono-level.
    outlier_budget: int = 0
    # occupancy-class query compaction for the tile path
    # (physics/ctiles.py): ((cap_k, n_cells_k), ...) plan-time class list
    # sizes, or None for the legacy full-cap sweep. Requires tile set,
    # outlier_budget == 0, and (for p3m) c_halfwidth == 1.
    tile_classes: tuple = None
    # multi-level tile engine spec (physics/mlevel.py):
    # ( ((grid, cap, n_act_a, n_act_b), ...), res_budget, mesh_level, nc ).
    # Mutually exclusive with `tile`; the per-chunk active-strip lists are
    # TRACED arguments (MLArgs) threaded through the chunk runner, so a
    # drifting state refreshes them without recompiling.
    mlevel: tuple = None
    # block-compact engine spec (physics/blocks.py):
    # (buckets, oct_grids, runs_xy, g_mesh). Mutually exclusive with
    # tile/mlevel; the per-chunk BlockArgs (packing orders, boxes, prefix
    # tables) are TRACED arguments threaded through the chunk runner —
    # drift refreshes them into the same compiled spec
    # (block_args_for_spec) without recompiling.
    blocks: tuple = None
    # certification-failure response. "gather": lax.cond fallback to the
    # exact gather engine (the default — stale plans cost speed, never
    # correctness). "none": the fallback branch is NOT compiled into the
    # program; a failed certificate DISCARDS the step (state returned
    # unchanged, stats zeroed, n_fallbacks counts it) and the caller must
    # replan + re-dispatch. Use at scales where the gather engine's
    # (N, Kh) planes cannot exist (N >= ~5e6 on 16 GB HBM: the fallback
    # branch alone demands ~30+ GB inside the compiled program).
    fallback: str = "gather"

    def __post_init__(self):
        if self.eos not in ("polytropic", "isothermal"):
            raise ValueError(f"unknown EOS {self.eos!r}")
        if self.fallback not in ("gather", "none"):
            raise ValueError(f"unknown fallback mode {self.fallback!r}")
        if self.gravity not in ("exact", "p3m"):
            raise ValueError(f"unknown gravity mode {self.gravity!r}")
        if (
            self.gravity == "p3m"
            and self.tile is None
            and self.mlevel is None
            and self.blocks is None
        ):
            raise ValueError("p3m gravity requires a tile/mlevel/blocks engine")
        if sum(x is not None for x in (self.tile, self.mlevel, self.blocks)) > 1:
            raise ValueError("tile, mlevel, and blocks are mutually exclusive")
        if self.tile_classes is not None:
            if self.tile is None:
                raise ValueError("tile_classes requires a tile config")
            if self.outlier_budget:
                raise ValueError("tile_classes excludes the outlier lane")
            if self.gravity == "p3m" and self.c_halfwidth != 1:
                raise ValueError(
                    "tile_classes + p3m requires c_halfwidth == 1 "
                    "(mesh_factor >= ceil(4.4 * sigma_cells))"
                )

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def mesh_gm(self) -> int:
        """Live mesh cells per edge (p3m mode)."""
        if self.tile is not None:
            g0 = self.tile[0]
        elif self.mlevel is not None:
            g0 = self.mlevel[0][0][0]
        else:
            g0 = self.blocks[3]  # the spec's mesh anchor grid
        return self.mesh_factor * g0

    @property
    def mesh_pad(self) -> int:
        """Padded FFT edge for isolated boundaries (p3m mode)."""
        from ..physics.mesh_gravity import good_fft_size

        return good_fft_size(2 * (self.mesh_gm + 2))

    @property
    def c_halfwidth(self) -> int:
        """P3M tail-correction stencil half-width in tile cells: the
        (2w+1)^3 block guarantees pair coverage to w tile cells = w *
        mesh_factor / sigma_cells Gaussian widths; w is the smallest
        half-width reaching TAIL_T = 4.4 sigma (complement ~1e-4)."""
        import math

        return max(
            1, math.ceil(4.4 * self.sigma_cells / self.mesh_factor - 1e-9)
        )


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

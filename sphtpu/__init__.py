"""sphtpu — a TPU-native astrophysical SPH framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
Julia engine (george-toka/Astrophysical-SPH): cubic-spline SPH with
artificial viscosity, softened self-gravity, isothermal and polytropic
equations of state, leapfrog KDK integration with a 4-criterion adaptive
timestep, 8 initial-condition generators, CSV snapshot warm restart, a
memory-mapped stats time series, and an offline renderer.

Architecture (see SURVEY.md §7):

    kernels/    cubic-spline W/gradW + softened gravity kernels (pure jnp,
                Pallas variants for the hot paths)
    neighbors/  blocked exact kNN on TPU (replaces NearestNeighbors.jl)
    physics/    density, EOS, artificial viscosity, pair forces, gravity
    engine/     fused KDK step (lax.scan), adaptive dt, diagnostics, driver
    shard/      particle-sharded multi-chip layer (shard_map over a Mesh)
    io/         reference-compatible CSV snapshot codec + stats memmap
    scenes/     the 8 IC generators + defaults + derived constants (host f64)
    viz/        offline matplotlib renderer (replaces GLMakie)
    cli.py      --generate/--run driver with the reference flag grammar

All device math runs in rescaled "code units" (G = 1) so float32 is safe on
TPU; snapshots on disk remain CGS float64 like the reference.
"""

__version__ = "0.1.0"

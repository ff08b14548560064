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


def _enable_compile_cache():
    """Persistent XLA compilation cache (compiles here run through a slow
    remote AOT helper — 1-15 min for the larger programs — so caching them
    across processes matters). Opt out with SPHTPU_NO_COMPILE_CACHE=1 or
    point SPHTPU_COMPILE_CACHE at a different directory."""
    import os

    if os.environ.get("SPHTPU_NO_COMPILE_CACHE"):
        return
    # XLA:CPU executables are host-ISA-specific: loading one cached on a
    # machine with different CPU features aborts the process (observed:
    # "+prefer-no-scatter not supported ... SIGILL" then Fatal Python
    # error during a fetch). Scope the cache per host fingerprint so a
    # box change starts a fresh cache instead of loading poison.
    def _host_tag():
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        import hashlib

                        return hashlib.sha256(
                            line.encode()
                        ).hexdigest()[:12]
        except OSError:
            pass
        import platform

        return platform.machine() or "unknown"

    path = os.environ.get(
        "SPHTPU_COMPILE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "jax_sphtpu", _host_tag()
        ),
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization, never a hard dependency
        pass


_enable_compile_cache()

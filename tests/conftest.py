"""Test harness config.

Tests run on CPU with 8 virtual devices so the multi-chip sharding path is
exercised without TPU hardware, and with x64 enabled so float64 oracle
comparisons are possible (the engine still takes an explicit dtype).

Some installed pytest plugins import jax before this conftest runs, so env
vars alone are not enough — jax.config is updated explicitly too (safe as
long as no backend has been initialized yet).
"""

import os

# raise the soft fd limit to the hard limit: a long suite accumulates
# XLA:CPU executables + 8-virtual-device collective plumbing, and fd
# exhaustion aborts the process with no message
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_NOFILE)
    if _soft < _hard:
        resource.setrlimit(resource.RLIMIT_NOFILE, (_hard, _hard))
except Exception:
    pass

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective" not in flags:
    # 8 virtual devices timeshare few host cores; the shard_map tests'
    # collective rendezvous can exceed XLA:CPU's default stuck/terminate
    # watchdogs late in a long suite (observed: "Expected 8 threads to
    # join the rendezvous" warnings escalating to a fatal abort). Give
    # the rendezvous room instead of dying. Round 4: on a 1-core host
    # the z-slab suite's ppermute chains reproducibly outlived even a
    # 900 s terminate window mid-run (fatal abort on the result fetch,
    # identically at the round-3 commit) yet pass cleanly in ~10 min
    # wall with 2 h budgets — these are ceilings for the pathological
    # host, not expected waits.
    flags += (
        " --xla_cpu_collective_timeout_seconds=7200"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
    )
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", "tests must run on CPU"
assert len(jax.devices()) >= 8, "tests expect 8 virtual CPU devices"

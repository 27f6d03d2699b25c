"""Test configuration: force CPU with 8 virtual devices.

Tests exercise the same pjit shardings a TPU pod slice would use, per the
multi-chip test strategy in SURVEY.md §4.

NOTE: this environment boots every python process with a sitecustomize
that registers the remote 'axon' TPU backend and force-sets
``jax_platforms="axon,cpu"`` — plain ``JAX_PLATFORMS=cpu`` env vars are
overridden.  ``jax.config.update`` after import wins because backends
resolve lazily at first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # This container reports nproc=1; an 8-participant CPU all-reduce
    # rendezvous then starves under ANY concurrent load and the default
    # ~40 s terminate timeout SIGABRTs the whole pytest process (seen as
    # "Fatal Python error: Aborted" in test_data_parallel_step).  Give
    # the rendezvous effectively unlimited time instead.
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
    )
os.environ["XLA_FLAGS"] = flags.strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is dominated by
# full/tiny-model CPU compiles that are identical run-over-run; caching
# the serialized executables cuts repeat suite time dramatically on this
# 1-core host.  Separate dir from the TPU bench cache (/tmp/jax_cache).
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

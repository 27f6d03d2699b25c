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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

"""Test configuration: force CPU with 8 virtual devices.

Tests exercise the same pjit shardings a TPU pod slice would use, per the
multi-chip test strategy in SURVEY.md §4 (the reference ships no tests at
all; SURVEY.md §4 defines the strategy this suite implements).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

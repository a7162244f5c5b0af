"""Test config: force the CPU platform with 8 virtual devices so tests are
hermetic and multi-chip sharding tests run anywhere (SURVEY.md §4 (e)).

Note: this environment's sitecustomize force-registers a remote "axon" TPU
backend and overrides ``jax_platforms`` to "axon,cpu", so env vars alone
are not enough — we must also update jax.config before any backend
initialization.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: tree-construction traces are large and stable
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

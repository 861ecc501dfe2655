"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference's GPU tests gracefully skip without a driver
(rhi/src/instance.rs:288-326); the rebuild does strictly better — the whole
pipeline runs on the CPU backend, and multi-chip sharding is validated on
a host-platform virtual mesh (SURVEY.md §4.2).
"""

import os

# Must be set before jax import: 8 virtual CPU devices for sharding tests.
# Hard-set (not setdefault): the machine profile exports JAX_PLATFORMS=axon
# (the TPU tunnel), and running unit tests over the tunnel is both slow and
# wrong for the virtual-mesh sharding tests.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Stand-in textures for stripped asset images (resources/model.py): keep
# them small under pytest — synthesis + mip builds at the production 2048
# default would add minutes to the asset-loading tests for no coverage
# gain. Tests that pin their own value (monkeypatch.setenv) still win.
os.environ.setdefault("RENDERER_STANDIN_TEX", "128")

import jax  # noqa: E402

# The machine's sitecustomize registers the axon (TPU-tunnel) backend and
# overrides jax_platforms; force CPU explicitly AFTER import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the build box has a single CPU core, so XLA
# compiles dominate test time; cache them across pytest runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

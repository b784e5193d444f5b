"""Test configuration: CPU backend with an 8-device virtual mesh and x64.

Mirrors SURVEY.md §4's plan: the reference's behavioral contract runs in one
process; our multi-device paths are exercised on a virtual CPU mesh via
``--xla_force_host_platform_device_count`` (real-chip numbers come from
``bench.py``).  x64 is enabled so golden comparisons at 1e-5..1e-10 are
meaningful; TPU production runs use f32 (see SolverOptions/bench).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The hosting environment may pre-register an accelerator platform that
# overrides JAX_PLATFORMS; pin the config explicitly so tests run on the
# virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

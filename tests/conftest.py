"""Test configuration: force CPU with 8 virtual devices.

Multi-device sharding tests run on a simulated 8-device CPU mesh
(``--xla_force_host_platform_device_count``), per the project's test strategy
(SURVEY.md §4): no TPU pod is needed to validate the sharded SVGD path.

Environment note: this machine's axon TPU integration registers itself from
a ``sitecustomize`` hook at interpreter startup and forces
``jax_platforms="axon,cpu"`` — env vars alone cannot opt out, and a CPU test
run would otherwise claim the single TPU (serializing every python process
on the tunnel). Overriding the config *after* importing jax (but before any
backend is initialized) restores a pure-CPU run.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

"""Test configuration: force CPU with 8 virtual devices.

Multi-device sharding tests run on a simulated 8-device CPU mesh
(``--xla_force_host_platform_device_count``), per the project's test strategy
(SURVEY.md §4): no TPU pod is needed to validate the sharded SVGD path.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

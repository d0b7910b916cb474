"""Mesh-sharded DiBS: the particle axis distributed over a device mesh.

Runs out of the box on any JAX device set:

* on a multi-chip TPU slice, particles are split across chips; the Pallas
  samplers and fused estimators run per shard (shard_map) and the [P, P]
  SVGD coupling rides the ICI as a ppermute ring;
* without real devices, simulate a mesh on CPU:

      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python examples/dibs_sharded.py

The sharded run is numerically identical to the unsharded one under the
same keys (tests/test_parallel.py pins this).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor JAX_PLATFORMS even when a site plugin force-registers another
# backend after env parsing (e.g. tunneled-TPU images)
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
from jax import random

from dibs_tpu.inference import JointDiBS
from dibs_tpu.metrics import expected_shd, threshold_metrics
from dibs_tpu.parallel import make_particle_mesh, particle_sharding
from dibs_tpu.target import make_linear_gaussian_model


def main():
    devices = jax.devices()
    print(f"devices: {len(devices)} x {devices[0].platform}")

    key = random.PRNGKey(0)
    key, subk = random.split(key)
    data, graph_model, likelihood_model = make_linear_gaussian_model(
        key=subk, n_vars=20, graph_prior_str="sf"
    )

    # one line turns on mesh sharding; n_particles must divide the mesh
    mesh = make_particle_mesh(devices)
    dibs = JointDiBS(
        x=data.x,
        graph_model=graph_model,
        likelihood_model=likelihood_model,
        sharding=particle_sharding(mesh),
    )

    n_particles = 8 * max(1, len(devices))
    key, subk = random.split(key)
    gs, thetas = dibs.sample(key=subk, n_particles=n_particles, steps=400)

    dist = dibs.get_mixture(gs, thetas)
    print("E-SHD :", float(expected_shd(dist=dist, g=data.g)))
    print("AUROC :", float(threshold_metrics(dist=dist, g=data.g)["roc_auc"]))


if __name__ == "__main__":
    main()

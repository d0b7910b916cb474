from dibs_tpu.ops.acyclic import acyclic_constr, elwise_acyclic_constr
from dibs_tpu.ops.edges import (
    edge_log_probs,
    edge_probs,
    edge_scores,
    latent_log_prob,
    particle_to_g_lim,
    particle_to_hard_graph,
    particle_to_soft_graph,
    sample_g,
)

__all__ = [
    "acyclic_constr",
    "elwise_acyclic_constr",
    "edge_scores",
    "edge_probs",
    "edge_log_probs",
    "latent_log_prob",
    "particle_to_g_lim",
    "particle_to_hard_graph",
    "particle_to_soft_graph",
    "sample_g",
]

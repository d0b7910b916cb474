"""Nonlinear Gaussian SEM with per-node MLP conditionals.

Behavioral spec: /root/reference/dibs/models/nonlinearGaussian.py. Each node
``j`` has its own dense MLP computing the conditional mean from the
*input-masked* observation vector ``x * g[:, j]`` (Zheng et al. 2020,
http://proceedings.mlr.press/v108/zheng20a/zheng20a.pdf); noise is additive
Gaussian; the parameter prior is zero-centered Gaussian with the first-layer
weight rows masked by the parent indicators.

TPU-native design: the reference builds one stax net and vmaps it over nodes.
Here the parameter pytree carries the node dimension as a leading axis on
every leaf and the forward pass for *all* nodes is a chain of batched
``[d, N, h_i] @ [d, h_i, h_{i+1}]`` einsum contractions — one MXU-batched
matmul per layer instead of ``d`` small per-node matmuls. The same batched
forward serves likelihood scoring, ancestral sampling, and (via extra leading
dims) the per-MC-sample relaxed-graph evaluations in the gradient estimators.

Parameter pytree layout (bias=True):
    [(W_1 [..., d, d, h1], b_1 [..., d, h1]),
     (W_2 [..., d, h1, h2], b_2 [..., d, h2]),
     ...,
     (W_L [..., d, h_{L-1}, 1], b_L [..., d, 1])]
where ``...`` are optional batch dims (particles etc.) and ``d`` is the
per-node axis. With bias=False each entry is the 1-tuple ``(W_i,)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random
from jax.scipy.stats import norm as jax_normal
from jax.tree_util import tree_map, tree_reduce

from dibs_tpu.ops.ancestral import interv_to_vectors, sample_sem_obs
from dibs_tpu.utils.tree import tree_shapes

__all__ = ["DenseNonlinearGaussian"]

_HI = jax.lax.Precision.HIGHEST

_ACTIVATIONS = {
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
}


class DenseNonlinearGaussian:
    """Nonlinear Gaussian BN with per-node dense-MLP conditional means.

    Args:
        n_vars: number of variables ``d``
        hidden_layers: tuple of hidden-layer widths, e.g. ``(5,)``
        obs_noise: additive observation-noise variance
        sig_param: std dev of the Gaussian prior over weights and biases
        activation: one of ``sigmoid``, ``tanh``, ``relu``, ``leakyrelu``
        bias: whether layers carry bias terms
    """

    def __init__(self, *, n_vars, hidden_layers, obs_noise=0.1, sig_param=1.0,
                 activation="relu", bias=True):
        if activation not in _ACTIVATIONS:
            raise KeyError(f"Invalid activation function `{activation}`")
        self.n_vars = n_vars
        self.obs_noise = obs_noise
        self.sig_param = sig_param
        self.hidden_layers = tuple(hidden_layers)
        self.activation = activation
        self.bias = bias
        self._act = _ACTIVATIONS[activation]
        self._dims = (n_vars, *self.hidden_layers, 1)
        self.no_interv_targets = jnp.zeros(n_vars, dtype=bool)

    # --- parameter initialization ---

    def _init_layer_stack(self, key, batch_shape):
        """Initializes the full parameter pytree with leading dims
        ``(*batch_shape, n_vars)`` on every leaf."""
        params = []
        lead = (*batch_shape, self.n_vars)
        for i in range(len(self._dims) - 1):
            key, k_w, k_b = random.split(key, 3)
            w = self.sig_param * random.normal(
                k_w, (*lead, self._dims[i], self._dims[i + 1])
            )
            if self.bias:
                b = self.sig_param * random.normal(k_b, (*lead, self._dims[i + 1]))
                params.append((w, b))
            else:
                params.append((w,))
        return params

    def get_theta_shape(self, *, n_vars):
        """Pytree of parameter shapes for a single particle (leading dim
        ``n_vars`` per leaf)."""
        del n_vars
        dummy = self._init_layer_stack(random.PRNGKey(0), ())
        return tree_shapes(dummy)

    def sample_parameters(self, *, key, n_vars, n_particles=0, batch_size=0):
        """Samples parameters from the prior with optional ``batch_size`` and
        ``n_particles`` leading dims (dims equal to 0 are dropped).

        Parameter dtype follows JAX's x64 state, which subsumes the
        reference's ``JAX_ENABLE_X64`` env sniff (nonlinearGaussian.py:184-185)
        — jax reads that env var at import, and ``random.normal`` then yields
        float64 leaves directly (pinned by
        tests/test_nonlinear_gaussian.py::test_sample_parameters_x64_parity).
        """
        del n_vars
        batch_shape = tuple(s for s in (batch_size, n_particles) if s != 0)
        return self._init_layer_stack(key, batch_shape)

    # --- forward pass ---

    def all_node_means(self, theta, x, g):
        """Conditional means of all nodes: ``[N, d]``.

        ``theta`` is a single particle's pytree (leading dim ``d`` per leaf),
        ``x`` is ``[N, d]``, ``g`` a (possibly soft) ``[d, d]`` adjacency.

        Node ``j``'s input is masked by its parent column ``g[:, j]``
        (reference nonlinearGaussian.py:289-294), but the mask is applied to
        the *first-layer weights* instead of the inputs — algebraically
        identical, ``(x ⊙ g[:, j]) @ W1_j == x @ (g[:, j, None] ⊙ W1_j)``.
        Under the estimators' ``[P, M]`` batching this replaces the
        ``[P, M, d, N, d]`` masked-input tensor (the round-2 cfg3 HBM hot
        spot: ~600 MB per step at the d=20 benchmark) with the ~20x smaller
        ``[P, M, d, d, h1]`` masked-weight tensor, and turns the first layer
        into one shared-``x`` MXU matmul over all particles/samples/nodes.
        Layers keep ``N`` in the minor (lane) dimension so no small trailing
        axis gets tile-padded.
        """
        from dibs_tpu.config import likelihood_matmul_precision

        prec = likelihood_matmul_precision()
        w1 = theta[0][0]  # [d(node), d(in), h1]
        w1m = g.T[:, :, None] * w1
        h = jnp.einsum("ni,jih->jhn", x, w1m, precision=prec)  # [d, h1, N]
        if self.bias:
            h = h + theta[0][1][:, :, None]
        for layer in theta[1:]:
            h = self._act(h)
            h = jnp.einsum("jhn,jho->jon", h, layer[0], precision=prec)
            if self.bias:
                h = h + layer[1][:, :, None]
        # [d, 1, N] -> [N, d]
        return h[:, 0, :].T

    # --- generative sampling ---

    def sample_obs(self, *, key, n_samples, g, theta, toporder=None, interv=None):
        """Ancestral sampling via the d-step SEM fixed point.

        ``g`` is an adjacency *matrix*. Matches the reference's generative
        convention that parentless nodes are pure noise ``N(0, obs_noise)``
        (their MLP, including bias, is bypassed —
        nonlinearGaussian.py:228-240), while intervened nodes are clamped.
        """
        del toporder
        g = jnp.asarray(g)
        has_parents = (g.sum(axis=0) > 0).astype(jnp.float32)  # [d]
        mask, values = interv_to_vectors(interv, self.n_vars)

        def mean_fn(x):
            return self.all_node_means(theta, x, g) * has_parents[None, :]

        return sample_sem_obs(
            key=key,
            n_samples=n_samples,
            n_vars=self.n_vars,
            mean_fn=mean_fn,
            obs_noise=self.obs_noise,
            interv_mask=mask,
            interv_values=values,
        )

    # --- pure/jittable scoring path ---

    def log_prob_parameters(self, *, theta, g):
        """Gaussian parameter prior with first-layer weights masked by parents.

        ``log p(Θ | G) = Σ log N(θ; 0, sig_param)`` where the first-layer
        weight row for input ``i`` of node ``j`` only counts if ``g[i, j]``
        (soft masking supported).
        """
        logprobs = tree_map(
            lambda leaf: jax_normal.logpdf(x=leaf, loc=0.0, scale=self.sig_param),
            theta,
        )
        first = logprobs[0]
        # [d(node), d(input), h1] * [d(node), d(input), 1]
        masked_first_w = first[0] * g.T[:, :, None]
        logprobs = [(masked_first_w, *first[1:])] + list(logprobs[1:])
        return tree_reduce(jnp.add, tree_map(jnp.sum, logprobs))

    def log_likelihood(self, *, x, theta, g, interv_targets):
        """Masked Gaussian likelihood over all nodes and observations."""
        # trace-time shape check (reference nonlinearGaussian.py:288)
        assert x.shape == interv_targets.shape, (
            f"x {x.shape} and interv_targets {interv_targets.shape} must match"
        )
        means = self.all_node_means(theta, x, g)
        logpdf = jax_normal.logpdf(x=x, loc=means, scale=jnp.sqrt(self.obs_noise))
        return jnp.sum(jnp.where(interv_targets, 0.0, logpdf))

    def interventional_log_joint_prob(self, g, theta, x, interv_targets, rng):
        """Joint ``log p(Θ, D | G)`` (inference contract)."""
        return self.log_prob_parameters(g=g, theta=theta) + self.log_likelihood(
            g=g, theta=theta, x=x, interv_targets=interv_targets
        )

"""dibs-tpu: a TPU-native Bayesian structure learning framework.

Differentiable Bayesian Structure learning (DiBS, Lorch et al., NeurIPS 2021)
rebuilt from scratch for TPU: JAX/XLA/Pallas compute path, Gram-matmul SVGD
transport, closed-form acyclicity VJP, mesh-sharded particles, and a native
C++ host-side graph kernel replacing igraph.

Public surface mirrors the reference library (`larslorch/dibs`):

    from dibs_tpu.inference import MarginalDiBS, JointDiBS
    from dibs_tpu.models import BGe, LinearGaussian, DenseNonlinearGaussian
    from dibs_tpu.target import make_linear_gaussian_model, ...
    from dibs_tpu.metrics import expected_shd, threshold_metrics, ...
"""

__version__ = "0.1.0"

from dibs_tpu import metrics, target  # noqa: E402,F401
from dibs_tpu.inference import JointDiBS, MarginalDiBS, SVGDState  # noqa: E402,F401
from dibs_tpu.kernel import (  # noqa: E402,F401
    AdditiveFrobeniusSEKernel,
    JointAdditiveFrobeniusSEKernel,
)
from dibs_tpu.models import (  # noqa: E402,F401
    BGe,
    DenseNonlinearGaussian,
    ErdosReniDAGDistribution,
    LinearGaussian,
    ScaleFreeDAGDistribution,
    UniformDAGDistributionRejection,
)

__all__ = [
    "MarginalDiBS",
    "JointDiBS",
    "SVGDState",
    "AdditiveFrobeniusSEKernel",
    "JointAdditiveFrobeniusSEKernel",
    "BGe",
    "LinearGaussian",
    "DenseNonlinearGaussian",
    "ErdosReniDAGDistribution",
    "ScaleFreeDAGDistribution",
    "UniformDAGDistributionRejection",
    "metrics",
    "target",
]

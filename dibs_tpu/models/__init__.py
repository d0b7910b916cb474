from dibs_tpu.models.graph import (
    ErdosReniDAGDistribution,
    ScaleFreeDAGDistribution,
    UniformDAGDistributionRejection,
)
from dibs_tpu.models.linear_gaussian import BGe, LinearGaussian
from dibs_tpu.models.nonlinear_gaussian import DenseNonlinearGaussian

__all__ = [
    "ErdosReniDAGDistribution",
    "ScaleFreeDAGDistribution",
    "UniformDAGDistributionRejection",
    "BGe",
    "LinearGaussian",
    "DenseNonlinearGaussian",
]

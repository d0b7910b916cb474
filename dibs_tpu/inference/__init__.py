from dibs_tpu.inference.svgd import DiBS, JointDiBS, MarginalDiBS, SVGDState
from dibs_tpu.inference.estimators import EstimatorConfig, make_estimators

__all__ = [
    "DiBS",
    "MarginalDiBS",
    "JointDiBS",
    "SVGDState",
    "EstimatorConfig",
    "make_estimators",
]

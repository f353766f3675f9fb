from deepfbsdejsolvers_tpu.ops.compensator import CompensatorSpec, compensated_mean
from deepfbsdejsolvers_tpu.ops.interp import uniform_interp_linear, uniform_interp_cubic

__all__ = [
    "CompensatorSpec",
    "compensated_mean",
    "uniform_interp_linear",
    "uniform_interp_cubic",
]

from deepfbsdejsolvers_tpu.models.merton import MertonJumpModel
from deepfbsdejsolvers_tpu.models.variance_gamma import VGModel

__all__ = ["MertonJumpModel", "VGModel"]

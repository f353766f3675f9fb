from deepfbsdejsolvers_tpu.solvers.pricing import (
    PRICING_SCHEMES,
    PricingSolver,
)
from deepfbsdejsolvers_tpu.solvers.train import TrainResult, fit

__all__ = ["PRICING_SCHEMES", "PricingSolver", "TrainResult", "fit"]

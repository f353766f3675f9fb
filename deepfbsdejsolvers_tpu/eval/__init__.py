from deepfbsdejsolvers_tpu.eval.mfg_solutions import (
    FrozenNoise,
    MFGFixedTrajectoryEvaluator,
    draw_frozen_noise,
    price_of_anarchy,
)

__all__ = [
    "FrozenNoise",
    "MFGFixedTrajectoryEvaluator",
    "draw_frozen_noise",
    "price_of_anarchy",
]

"""L4 experiment pipelines — the framework's equivalents of the reference's
entry scripts (mainMerton.py, mainVG.py, mainMFGComparison.py, mainMFGPoA.py)
behind typed configs and one CLI (``python -m deepfbsdejsolvers_tpu``).

The reference duplicates argparse + hard-coded parameter dicts per script with
a fragile ``dict.values()``-unpacking idiom (mainMerton.py:57-58 — SURVEY.md
§5); here each experiment is a dataclass config with reference defaults plus a
pure ``run_*`` function returning structured results, with optional JSONL metrics,
checkpoints, and matplotlib figures.
"""

from deepfbsdejsolvers_tpu.experiments.configs import (
    MertonConfig,
    MFGComparisonConfig,
    MFGPoAConfig,
    VGConfig,
)
from deepfbsdejsolvers_tpu.experiments.pricing import run_pricing
from deepfbsdejsolvers_tpu.experiments.mfg_comparison import run_mfg_comparison
from deepfbsdejsolvers_tpu.experiments.mfg_poa import run_mfg_poa

__all__ = [
    "MertonConfig",
    "VGConfig",
    "MFGComparisonConfig",
    "MFGPoAConfig",
    "run_pricing",
    "run_mfg_comparison",
    "run_mfg_poa",
]

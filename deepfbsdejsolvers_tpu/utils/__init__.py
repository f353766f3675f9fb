"""Runtime utilities: metrics logging, checkpointing, profiling.

The reference has no observability beyond per-epoch ``print`` statements and no
checkpointing at all (weights live only in process memory — SURVEY.md §5).
These modules supply the production-runtime tier of the new framework.
"""

from deepfbsdejsolvers_tpu.utils.logging import JSONLWriter, MetricsLogger
from deepfbsdejsolvers_tpu.utils.checkpointing import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)
from deepfbsdejsolvers_tpu.utils.profiling import ThroughputMeter, trace_profile

__all__ = [
    "JSONLWriter",
    "MetricsLogger",
    "CheckpointManager",
    "save_checkpoint",
    "restore_checkpoint",
    "ThroughputMeter",
    "trace_profile",
]

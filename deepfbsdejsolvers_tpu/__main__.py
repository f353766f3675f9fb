"""``python -m deepfbsdejsolvers_tpu`` — experiment CLI entry point."""

import sys

from deepfbsdejsolvers_tpu.experiments.cli import main

sys.exit(main())

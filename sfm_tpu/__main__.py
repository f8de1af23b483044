"""``python -m sfm_tpu`` entry point."""
import sys

from sfm_tpu.cli import main

sys.exit(main())

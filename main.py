"""Entry point with the reference's surface: python main.py {preprocess|reconstruct|pipeline}.

Thin delegate to the installed CLI (sfm_tpu/cli.py — argparse subcommands,
validation ranges, logging setup; ref main.py:52-115 parity, without the
hardcoded paths).
"""
import sys

from sfm_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())

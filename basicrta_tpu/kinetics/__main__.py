"""``python -m basicrta_tpu.kinetics`` — module entry-point parity with
``python -m basicrta.kinetics`` (reference kinetics.py:207-222)."""
import sys

from basicrta_tpu.cli import main

if __name__ == "__main__":
    main(["kinetics"] + sys.argv[1:])

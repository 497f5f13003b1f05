"""``python -m basicrta_tpu.cluster`` — module entry-point parity with
``python -m basicrta.cluster`` (reference cluster.py:178-192). The
aggregation logic lives in :mod:`basicrta_tpu.protein.driver`; this is a
CLI shim."""
import sys

from basicrta_tpu.cli import main

if __name__ == "__main__":
    main(["cluster"] + sys.argv[1:])

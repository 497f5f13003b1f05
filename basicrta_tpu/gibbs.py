"""``python -m basicrta_tpu.gibbs`` — module entry-point parity with
``python -m basicrta.gibbs`` (reference gibbs.py:781-795). The sampler
itself lives in :mod:`basicrta_tpu.sampler.gibbs`; this is a CLI shim."""
import sys

from basicrta_tpu.cli import main

if __name__ == "__main__":
    main(["gibbs"] + sys.argv[1:])

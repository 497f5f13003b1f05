"""``python -m basicrta_tpu.contacts`` — module entry-point parity with
``python -m basicrta.contacts`` (reference contacts.py:234-252)."""
import sys

from basicrta_tpu.cli import main

if __name__ == "__main__":
    main(["contacts"] + sys.argv[1:])

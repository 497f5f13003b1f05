"""``python -m basicrta_tpu`` — the full CLI."""
from basicrta_tpu.cli import main

if __name__ == "__main__":
    main()

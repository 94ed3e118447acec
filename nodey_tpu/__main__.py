"""``python -m nodey_tpu`` — the headless CLI entry point."""

import sys

from nodey_tpu.app.cli import main

if __name__ == "__main__":
    sys.exit(main())

"""``python -m fealess_tpu <action> ...`` — the CLI driver entry point
(reference: the FEALESS binary, test/main.cpp:14-76)."""

import sys

from fealess_tpu.apps.cli import main

if __name__ == "__main__":
    sys.exit(main())

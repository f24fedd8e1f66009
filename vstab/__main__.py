"""`python -m vstab ...` entry point (ADVICE.md r2: the documented CLI
invocation needs a package __main__)."""

import sys

from vstab.cli import main

sys.exit(main())

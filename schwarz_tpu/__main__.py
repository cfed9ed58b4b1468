"""``python -m schwarz_tpu`` runs the CLI driver (cf. bench_ras main)."""

import sys

from schwarz_tpu.cli import main

sys.exit(main())

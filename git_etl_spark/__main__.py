"""``python -m git_etl_spark`` — O3 CLI entry (reference ``main.ts:311``)."""

import sys

from .cli import main

sys.exit(main())

"""``python -m webgraph_spark`` — see :mod:`webgraph_spark.cli`."""

import sys

from .cli import main

sys.exit(main())

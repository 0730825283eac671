"""CLI entry point: ``python -m flink_commons_spark <action> [options]``.

Mirrors the reference's ``FlinkActions.main`` dispatch
(``FlinkActions.java:11-22``): first argument selects the action, the
rest are action options; ``--help`` at either level prints usage.
"""

import sys

from flink_commons_spark.actions.base import main

if __name__ == "__main__":
    sys.exit(main())

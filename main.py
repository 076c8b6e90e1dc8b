"""spark-submit driver script: `spark-submit [--py-files ...] main.py <cmd> ...`."""

import sys

from hikma_engine_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

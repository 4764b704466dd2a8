#!/usr/bin/env python
"""spark-submit entry point: thin shim over web_crawler_spark.cli so the
same flags work under ``spark-submit --py-files web_crawler_spark.zip``.
On a cluster the SparkSession comes from spark-submit's conf (the cli's
get_spark getOrCreate() picks it up; --master is not forced)."""

import sys

from web_crawler_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""spark-submit entrypoint:

    zip -r /tmp/neosync_spark.zip neosync_spark
    spark-submit --master local[32] --py-files /tmp/neosync_spark.zip \
        run_cdc.py replay --log <changelog> --table <dest> \
        --mapping text=transform_pii_text --mapping tool=transform_character_scramble
"""
import sys

from neosync_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

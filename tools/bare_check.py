"""Driver-environment mirror: run every registered query on a BARE
SparkSession from a NEUTRAL cwd.

The verification driver builds its own SparkSession (none of
session.get_spark's confs) and may run from any directory (so Python
workers don't inherit the repo on sys.path). Both differences have bitten:
nanos-timestamp reads need a conf pinned at read time, and Python-escape-
hatch operators need the package shipped to workers via addPyFile. This
script reproduces that environment exactly — run it before relying on a
green in-repo gate.

Usage: python tools/bare_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    os.chdir(tempfile.mkdtemp(prefix="bare_check_"))  # neutral cwd
    sys.path.insert(0, REPO)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("bare-check")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    errs = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            n = fn(spark, sf_dir).count()
            print(f"ok   {name} ({n} rows)", flush=True)
        except Exception as ex:  # noqa: BLE001
            errs += 1
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:300]}", flush=True)
    print(f"{len(queries) - errs} ok, {errs} failed", flush=True)
    spark.stop()
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Print the optimized + executed plan of any registered query.

Usage: python tools/explain_query.py <query_name> [sf_dir] [--formatted]

The fast way to answer "is this the plan I'd want at 100 TB?" for any of
the registry's queries — shows pushed filters, read schemas, join
strategies, and exchange placement without writing a scratch script.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    formatted = "--formatted" in sys.argv
    if not args:
        print(__doc__)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    from fraud_detection_etl_project_spark.plans import REGISTRY
    from fraud_detection_etl_project_spark.session import get_spark

    if name not in REGISTRY:
        print(f"unknown query {name!r}; registry has {len(REGISTRY)} entries")
        for n in REGISTRY:
            print(" ", n)
        return 2
    spark = get_spark(app_name=f"explain-{name}")
    df = REGISTRY[name].fn(spark, sf_dir)
    if formatted:
        df.explain(mode="formatted")
    else:
        qe = df._jdf.queryExecution()
        print("== Optimized Logical Plan ==")
        print(qe.optimizedPlan().toString())
        print("== Physical Plan ==")
        print(qe.executedPlan().toString())
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Capture .explain("formatted") for every bench-flagged query into
plans/<tag>/<query>_<suffix>.txt — the optimization round's plan evidence.

Usage: python tools/capture_plans.py <tag> <suffix> [sf_dir] [query ...]
e.g.   python tools/capture_plans.py r11 before /root/testdata/sf0.1
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4:])

    from fraud_detection_etl_project_spark.plans import BENCH_QUERIES, REGISTRY
    from fraud_detection_etl_project_spark.session import get_spark

    spark = get_spark(app_name=f"plans-{tag}-{suffix}")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    names = sorted(only) if only else sorted(BENCH_QUERIES())
    for name in names:
        spec = REGISTRY[name]
        try:
            df = spec.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain(mode="formatted")
            text = buf.getvalue()
        except Exception as e:  # capture the failure as evidence too
            text = f"EXPLAIN FAILED: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            f.write(text)
        print(f"wrote {name}_{suffix}.txt ({len(text)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Profile one or more registry queries: capture .explain("formatted")
and time noop-sink runs (cold + N steady) under the SAME tuned session
bench.py uses.

Usage:
    python tools/profile_query.py NAME [NAME...] [--sf DIR] [--runs N]
                                  [--plan-dir DIR] [--suffix before|after]

Writes DIR/<name>_<suffix>.txt when --plan-dir is given and prints one
line per query: name, cold, then each steady run.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from django_indexer_spark.plans.fixture_queries import QUERIES
from django_indexer_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.names:
        if name not in QUERIES:
            print(f"{name}: NOT IN REGISTRY")
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = QUERIES[name](spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plan_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())

        def run() -> float:
            t0 = time.time()
            QUERIES[name](spark, args.sf).write.mode("overwrite").format("noop").save()
            return time.time() - t0

        cold = run()
        steadies = [run() for _ in range(args.runs)]
        print(
            f"{name}: cold={cold:.2f}s steady="
            + ",".join(f"{s:.2f}" for s in steadies),
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()

"""Per-query profiler for the optimization rounds.

For each named registry query: build the plan against $SPARK_GRAFT_SF_DIR
(default sf0.1), dump .explain("formatted") to plans/<tag>/<name>_<suffix>.txt,
then time N warm noop-sink materializations (after one unmeasured warm-up,
matching bench.py's two-pass protocol). Prints per-query seconds and a plan
summary (Exchange count, join strategies, Python-boundary nodes).

Usage:
    python tools/profile_query.py [--plans-dir plans/r17] [--suffix before]
        [--runs 2] [--no-plan] query [query ...]
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_data_pipeline_spark.queries import queries  # noqa: E402
from yelp_data_pipeline_spark.session import get_spark, release_tracked  # noqa: E402


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_summary(txt: str) -> str:
    n_exchange = len(re.findall(r"\bExchange\b", txt))
    joins = sorted(set(re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b", txt)))
    py = sorted(set(re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
        r"FlatMapGroupsInPandas)\b", txt)))
    return (f"Exchange={n_exchange} joins={','.join(joins) or '-'} "
            f"python={','.join(py) or '-'}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    for name in args.names:
        if name not in qs:
            print(f"SKIP {name}: not in registry")
            continue
        df = qs[name](spark, sf_dir)
        if not args.no_plan and args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            txt = plan_text(df)
            path = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"{name}: plan -> {path} [{plan_summary(txt)}]")
        release_tracked()
        if args.runs <= 0:
            continue
        # warm-up pass (fresh plan), then measured passes on fresh plans
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_tracked()
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"measure:{name}:{i}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format(
                "noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            release_tracked()
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: " + " ".join(f"{t:.2f}s" for t in times)
              + f"  (min {min(times):.2f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

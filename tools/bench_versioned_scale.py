"""Scale point for the versioned-table family: commit-count scaling.

The sf0.1 bench rows for orders_versioned_append_diff /
orders_incremental_agg_maintenance carry 3 commits; this tool builds
the SAME table (sf0.1 orders, fixed total data volume) as 3 vs 30
append commits and times, at each commit count:

- ``diff_read``     — read_version_diff of the LAST increment + the
                      monoid partial aggregate over it (the per-batch
                      incremental-maintenance step). Claim under test:
                      cost ~ batch size (so at 30 commits, ~1/10 the
                      3-commit cost), never the table.
- ``full_recompute``— the same aggregate over the latest snapshot
                      (what a non-incremental consumer pays). Claim:
                      ~flat across commit counts (same total data;
                      only per-file open overhead grows).
- ``history``       — version_history().collect(): checkpoint + tail,
                      so ~flat in commit count.
- ``build``         — wall clock for all commits (write amplification
                      check: appends re-reference, never rewrite).

Prints one JSON line per commit count plus a ratio summary line.
Usage: python tools/bench_versioned_scale.py [runs-per-point]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from yelp_data_pipeline_spark.operators import versioned as vt  # noqa: E402
from yelp_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def partial(df):
    # The monoid partial of orders_incremental_agg_maintenance.
    return df.groupBy(F.month("o_orderdate").alias("order_month")).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(27,4)")).alias("p_sum"),
    )


def build(orders, n_batches: int):
    tmp = tempfile.mkdtemp(prefix="spark_graft_vscale_")
    table = tmp + "/orders"
    t0 = time.time()
    vt.create_versioned(orders.filter(F.col("o_orderkey") % n_batches == 0), table)
    for b in range(1, n_batches):
        vt.append_versioned(
            orders.filter(F.col("o_orderkey") % n_batches == b), table
        )
    return table, tmp, time.time() - t0


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark()
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    results = {}
    for n in (3, 30):
        table, tmp, build_s = build(orders, n)
        try:
            diff_ts, full_ts, hist_ts = [], [], []
            for _ in range(runs):
                t0 = time.time()
                partial(vt.read_version_diff(spark, table, n - 2, n - 1)).collect()
                diff_ts.append(time.time() - t0)
                t0 = time.time()
                partial(vt.read_version(spark, table, n - 1)).collect()
                full_ts.append(time.time() - t0)
                t0 = time.time()
                vt.version_history(spark, table).collect()
                hist_ts.append(time.time() - t0)
            row = {
                "commits": n,
                "build_sec": round(build_s, 3),
                "diff_read_sec": round(min(diff_ts), 3),
                "full_recompute_sec": round(min(full_ts), 3),
                "history_sec": round(min(hist_ts), 3),
                "sf_dir": SF_DIR,
                "runs": runs,
            }
            results[n] = row
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    a, b = results[3], results[30]
    print(
        json.dumps(
            {
                "diff_read_ratio_30v3": round(
                    b["diff_read_sec"] / a["diff_read_sec"], 3
                ),
                "full_recompute_ratio_30v3": round(
                    b["full_recompute_sec"] / a["full_recompute_sec"], 3
                ),
                "history_ratio_30v3": round(
                    b["history_sec"] / a["history_sec"], 3
                ),
                "incremental_vs_full_at_30": round(
                    b["diff_read_sec"] / b["full_recompute_sec"], 3
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

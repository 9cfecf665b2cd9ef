"""End-to-end pipeline entry points — the reference's two monthly jobs
(SURVEY.md §3 entry points 1-2) assembled from the operator library.

``bronze_to_silver`` mirrors ``bronze_to_silver_on_minio.py:127-190``:
raw Yelp-shaped JSON → cleaned, typed Silver tables (business/users
full-overwrite; checkins/reviews/tips month-scoped, written with
dynamic partition overwrite).

``silver_to_gold`` mirrors ``silver_to_gold_on_minio.py:147-225``:
Silver → star-schema Gold (dim_time, dim_business, dim_user — the
schema.png table the reference declares but never builds —
bridge_business_category, fact_review, fact_checkin), with MERGE
upsert semantics on the keyed tables.

Storage is parquet (the harness has no Delta jars); the writers go
through operators/upsert.py, whose Delta paths activate when
delta-spark is importable. Month parameters drive partition-column
predicates, never path arithmetic (the reference's S4 anti-pattern).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import cleaning as cl
from .operators import dims, facts, joins
from .operators.aggregates import group_count
from .operators.upsert import merge_upsert_df, write_partitioned
from .tables import read_json_source

SILVER_PARTITIONED = ("checkins", "reviews", "tips")


def _write_overwrite(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def bronze_to_silver(
    spark: SparkSession, bronze_dir: str, silver_dir: str, year: int, month: int
) -> dict[str, DataFrame]:
    """Monthly Bronze→Silver job. Returns the written Silver frames."""
    out: dict[str, DataFrame] = {}

    business = read_json_source(spark, f"{bronze_dir}/business")
    out["business"] = cl.process_business(business)
    _write_overwrite(out["business"], f"{silver_dir}/business")

    users = read_json_source(spark, f"{bronze_dir}/user")
    out["users"] = cl.process_users(users)
    _write_overwrite(out["users"], f"{silver_dir}/users")

    checkins = cl.process_checkins(read_json_source(spark, f"{bronze_dir}/checkin"))
    out["checkins"] = checkins.filter(
        (F.col("year") == year) & (F.col("month") == month)
    )
    write_partitioned(out["checkins"], f"{silver_dir}/checkins", ["year", "month"])

    for entity, src in (("reviews", "review"), ("tips", "tip")):
        raw = read_json_source(
            spark,
            f"{bronze_dir}/{src}",
            partition_filter=(F.col("year") == year) & (F.col("month") == month),
        )
        # bronze partition dirs provide (year, month); the cleaner
        # re-derives them from the payload date (B2S:108-111)
        dated = cl.add_event_date_parts(raw.drop("year", "month"), "date")
        out[entity] = dated
        write_partitioned(dated, f"{silver_dir}/{entity}", ["year", "month"])
    return out


def silver_to_gold(
    spark: SparkSession, silver_dir: str, gold_dir: str, year: int, month: int
) -> dict[str, DataFrame]:
    """Monthly Silver→Gold job. Returns the written Gold frames."""
    month_pred = (F.col("year") == year) & (F.col("month") == month)
    reviews = spark.read.parquet(f"{silver_dir}/reviews").filter(month_pred)
    checkins = spark.read.parquet(f"{silver_dir}/checkins").filter(month_pred)
    business = spark.read.parquet(f"{silver_dir}/business")
    users = spark.read.parquet(f"{silver_dir}/users")

    out: dict[str, DataFrame] = {}

    # dim_time — month-scoped (S2G:18-35; date_id restarts per month,
    # SURVEY §5 caveat), union of review + checkin dates
    dates = (
        reviews.select(F.to_date("date").alias("date"))
        .union(checkins.select(F.to_date("date").alias("date")))
        .distinct()
    )
    dim_time = dims.build_dim_time(dates)
    out["dim_time"] = dim_time
    write_partitioned(dim_time, f"{gold_dir}/dim_time", ["year", "month"])

    # dim_business / dim_user — MERGE upsert on the natural key
    dim_business = dims.project_dim(
        business,
        {
            "business_id": "business_id",
            "name": "name",
            "city": "city",
            "state": "state",
            "postal_code": "postal_code",
            "latitude": "latitude",
            "longitude": "longitude",
            "is_open": "is_open",
            "review_count": "review_count",
            "stars": "stars_avg",
        },
    )
    out["dim_business"] = _upsert(spark, dim_business, f"{gold_dir}/dim_business", ["business_id"])

    dim_user = dims.project_dim(
        users,
        {
            "user_id": "user_id",
            "name": "name",
            "yelping_since": "yelping_since",
            "review_count": "review_count",
            "average_stars": "average_stars",
            "useful": "useful",
            "funny": "funny",
            "cool": "cool",
            "fans": "fans",
            "elite_years_count": "elite_years_count",
            "friends_count": "friends_count",
        },
    )
    out["dim_user"] = _upsert(spark, dim_user, f"{gold_dir}/dim_user", ["user_id"])

    # bridge — explode categories, dictionary-encode, distinct pairs
    exploded = cl.explode_csv(
        business.select("business_id", "categories").filter(
            F.col("categories").isNotNull()
        ),
        "categories",
        "category_name",
    )
    cats = dims.dictionary_encode(exploded, "category_name", "category_id")
    bridge = (
        joins.join_broadcast_dim(
            exploded.select("business_id", "category_name"), cats, "category_name"
        )
        .select("business_id", "category_id", "category_name")
        .distinct()
    )
    out["bridge_business_category"] = _upsert(
        spark, bridge, f"{gold_dir}/bridge_business_category", ["business_id", "category_id"]
    )

    # facts — measures ⟕ dim_time, partitioned dynamic overwrite
    fact_review = facts.attach_date_dim(
        reviews.select("business_id", "user_id", "date", "stars", "useful", "funny", "cool"),
        dim_time,
        F.to_date("date"),
        dim_cols=("date_id", "year", "month"),
    ).select(
        "business_id", "user_id", "date_id", "year", "month",
        "stars", "useful", "funny", "cool",
    )
    out["fact_review"] = fact_review
    write_partitioned(fact_review, f"{gold_dir}/fact_review", ["year", "month"])

    daily = group_count(
        checkins.select("business_id", F.to_date("date").alias("date")),
        ["business_id", "date"],
        alias="checkin_count",
    )
    fact_checkin = facts.attach_date_dim(
        daily, dim_time, F.col("date"), dim_cols=("date_id", "year", "month")
    ).select("business_id", "date_id", "year", "month", "checkin_count")
    out["fact_checkin"] = fact_checkin
    write_partitioned(fact_checkin, f"{gold_dir}/fact_checkin", ["year", "month"])
    return out


def _upsert(spark: SparkSession, updates: DataFrame, path: str, keys: list[str]) -> DataFrame:
    """S9 MERGE semantics on a parquet table: create-if-absent, else
    updates ∪ (target anti-join updates) rewritten (the Delta MERGE
    branch in operators/upsert.py takes over when delta is present).

    The rewrite goes through a staging directory + rename: you cannot
    overwrite a parquet path while a lazy plan still reads it, and a
    driver-side collect would not scale. (Delta does this swap
    transactionally; staging+rename is the filesystem stand-in.)
    """
    import shutil

    if os.path.isdir(path):
        target = spark.read.parquet(path)
        merged = merge_upsert_df(target, updates.select(*target.columns), keys)
        staging = path + "__staging"
        _write_overwrite(merged, staging)
        shutil.rmtree(path)
        os.rename(staging, path)
    else:
        _write_overwrite(updates, path)
    return spark.read.parquet(path)


def month_range(
    start: tuple[int, int], end: tuple[int, int]
) -> list[tuple[int, int]]:
    """Inclusive (year, month) range, ascending — the schedule a
    ``catchup=True`` monthly DAG would enumerate."""
    sy, sm = start
    ey, em = end
    if (sy, sm) > (ey, em):
        raise ValueError(f"start {start} after end {end}")
    out, y, m = [], sy, sm
    while (y, m) <= (ey, em):
        out.append((y, m))
        m += 1
        if m == 13:
            y, m = y + 1, 1
    return out


def backfill(
    spark: SparkSession,
    bronze_dir: str,
    silver_dir: str,
    gold_dir: str,
    start: tuple[int, int],
    end: tuple[int, int],
    retries: int = 1,
    _b2s=None,
    _s2g=None,
) -> list[dict]:
    """Month-range backfill with the reference DAG's orchestration
    semantics (mnt/airflow/dags/yelp_pipeline.py:10-21) re-expressed
    as a driver loop:

    - ``catchup=True``   → every month in [start, end] runs, oldest
      first (:func:`month_range`);
    - ``max_active_runs=1`` → months run strictly sequentially —
      REQUIRED for correctness here, not just politeness: gold MERGE
      upserts fold month N's dims into month N-1's table state, so
      two months racing would lose updates;
    - ``bronze_to_silver >> silver_to_gold`` → task order within a
      month; a month's s2g never starts before its b2s committed;
    - ``retries: 1`` → each task re-attempts ``retries`` times on
      failure before the backfill aborts (remaining months DON'T run
      — Airflow's depends-on-failed-upstream posture for a linear
      chain).

    Rerun idempotence is the property that makes retries safe, and it
    holds by construction: silver month-scoped tables write via
    dynamic partition overwrite (replaying a month replaces exactly
    that month's partitions), gold keyed tables go through the MERGE
    twin (same keys → same survivors). Verified in
    tests/test_backfill.py by table-state equality.

    Returns one summary dict per (month, task) with row counts.
    """
    b2s = _b2s or bronze_to_silver
    s2g = _s2g or silver_to_gold
    summary: list[dict] = []
    for year, month in month_range(start, end):
        for task_name, task, src, dst in (
            ("bronze_to_silver", b2s, bronze_dir, silver_dir),
            ("silver_to_gold", s2g, silver_dir, gold_dir),
        ):
            attempt = 0
            while True:
                try:
                    out = task(spark, src, dst, year, month)
                    break
                except Exception:
                    attempt += 1
                    if attempt > retries:
                        raise
            summary.append(
                {
                    "year": year,
                    "month": month,
                    "task": task_name,
                    "attempts": attempt + 1,
                    "rows": {name: df.count() for name, df in out.items()},
                }
            )
    return summary


def curate_documents_job(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_quality: float = 0.45,
    min_tokens: int = 5,
    max_tokens: int = 5000,
    jaccard: float = 0.8,
) -> DataFrame:
    """LLM-training-data curation, end to end: PII scrub → quality
    gate → MinHash near-dup clustering → one survivor per cluster →
    Hive-partitioned parquet by language.

    The whole chain is one declarative plan per stage; the only
    driver round-trips are the connected-components convergence
    scalars. Survivors are the cluster-min doc ids, so reruns are
    deterministic. Output partitioning by ``lang`` makes the
    downstream per-language sampling reads partition-pruned.
    """
    from .operators import dedup as dd
    from .operators import graph
    from .operators import textops as tx
    from .tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    quality_ok = (
        tx.quality_features(docs, "doc_id", "text")
        .filter(
            (F.col("quality_score") >= min_quality)
            & F.col("n_tokens").between(min_tokens, max_tokens)
        )
        .select("doc_id")
    )
    pairs = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", k=12, bands=4, threshold=jaccard
    )
    clusters = graph.dedup_clusters(docs, pairs)
    survivors = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
        "doc_id"
    )

    scrubbed = tx.scrub_pii(docs, "doc_id", "text")
    curated = (
        docs.join(quality_ok, "doc_id", "left_semi")
        .join(survivors, "doc_id", "left_semi")
        .join(scrubbed.select("doc_id", "scrubbed_text"), "doc_id")
        .select("doc_id", "scrubbed_text", "source", "n_chars", "lang")
    )
    # Static overwrite: this job rewrites the WHOLE corpus every run
    # (it is not month-incremental), so stale partitions from a prior,
    # less strict run must not survive — dynamic overwrite would leave
    # them in place whenever the new run emits fewer languages.
    write_partitioned(curated, out_dir, ["lang"], dynamic=False)
    # The write above materialized every operator-persisted relation
    # (MinHash signatures, CC labels); release them so a long-lived
    # session doesn't accumulate cached blocks.
    from .session import release_tracked

    release_tracked()
    # Return the written plan, not a read-back: a legitimately empty
    # result leaves no parquet footer to infer a schema from, and the
    # job must not throw on it.
    return curated

"""Lock the oracle type-safety gate (tools/audit_oracle_types.py):
the round-6..8 orders_column_profile incident was an uncast DuckDB
HUGEINT reaching a final projection and materializing as float64
through pandas/Arrow. These tests pin the gate itself — the positive
sweep over the live registry and a negative control proving the gate
actually catches the bug class."""

import sys

sys.path.insert(0, "/root/repo")

import duckdb

from tools.audit_oracle_types import SAFE


def test_safe_set_contents():
    # The pandas-unsafe types must NOT be in the safe set.
    for bad in ("HUGEINT", "DECIMAL", "FLOAT"):
        assert bad not in SAFE


def test_negative_control_uncast_sum_is_hugeint():
    """The exact bug class: sum(CASE..) over integers is HUGEINT in
    DuckDB and must be flagged by the gate's type check."""
    con = duckdb.connect()
    rel = con.sql(
        "SELECT sum(CASE WHEN 1=2 THEN 1 ELSE 0 END) AS n FROM range(5) LIMIT 0"
    )
    t = str(rel.types[0])
    assert t.split("(")[0] == "HUGEINT"
    assert t.split("(")[0] not in SAFE
    # ...and the documented fix lands in the safe set.
    rel2 = con.sql(
        "SELECT CAST(sum(CASE WHEN 1=2 THEN 1 ELSE 0 END) AS BIGINT) AS n "
        "FROM range(5) LIMIT 0"
    )
    assert str(rel2.types[0]).split("(")[0] in SAFE


def test_registry_oracles_all_safe():
    """Positive sweep: every live oracle's final projection stays in
    the pandas-safe set (same logic as the CLI tool, in-process)."""
    from yelp_data_pipeline_spark import TABLES
    from yelp_data_pipeline_spark.queries import registry

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    for spec in registry():
        if spec.oracle is None:
            continue
        rel = con.sql(f"SELECT * FROM ({spec.oracle}) LIMIT 0")
        for c, ty in zip(rel.columns, [str(x) for x in rel.types]):
            if ty.split("(")[0] not in SAFE:
                bad.append((spec.name, c, ty))
    assert not bad, bad

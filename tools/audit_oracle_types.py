"""Audit every registry oracle's FINAL output column types in DuckDB.

The round-6→8 `orders_column_profile` incident: an uncast
``sum(CASE..)`` in the oracle is HUGEINT (int128) in DuckDB, which
materializes as float64 through pandas/Arrow — so a driver that hashes
through a dataframe sees ``0.0`` where Spark emits ``0``, while a
``fetchall()``-based local checker (Python int either way) stays green.
The divergence class is the TYPE of the final projected column, not any
value: this audit therefore fails any oracle whose result schema
contains a type outside the pandas-safe set

    BIGINT  INTEGER  SMALLINT  TINYINT  DOUBLE  VARCHAR  DATE
    TIMESTAMP  BOOLEAN

(HUGEINT → float64; DECIMAL → float64 or object-Decimal depending on
driver version; FLOAT → float32 repr drift — all banned in final
projections; intermediate CTEs may use anything.)

Usage: python tools/audit_oracle_types.py [sf_dir]
Exit 1 if any oracle emits an unsafe type.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

from yelp_data_pipeline_spark import TABLES
from yelp_data_pipeline_spark.queries import registry

SAFE = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BOOLEAN",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    n = 0
    for spec in registry():
        if spec.oracle is None:
            continue
        n += 1
        try:
            rel = con.sql(f"SELECT * FROM ({spec.oracle}) LIMIT 0")
            types = [str(t) for t in rel.types]
            cols = rel.columns
        except Exception as e:  # noqa: BLE001
            bad.append((spec.name, f"describe error: {e}"))
            continue
        offenders = [
            f"{c}:{t}" for c, t in zip(cols, types) if t.split("(")[0] not in SAFE
        ]
        if offenders:
            bad.append((spec.name, ", ".join(offenders)))
    for name, msg in bad:
        print(f"UNSAFE {name}: {msg}")
    print(f"\naudited {n} oracles — " + ("ALL SAFE" if not bad else f"{len(bad)} unsafe"))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # saveAsTable target for the bucketing tests
            "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("warehouse")),
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def normalize_events_ts(df, ts_col="ts"):
    """Fixture-generation-proof ts normalizer: nanos-as-long (older
    testdata) and naive-micros TIMESTAMP_NTZ (newer testdata) both
    become a session-UTC timestamp, matching tables.load_table."""
    import pyspark.sql.functions as F

    t = dict(df.dtypes).get(ts_col)
    if t == "bigint":
        return df.withColumn(ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000")))
    if t == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df

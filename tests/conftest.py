from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from geonames_rdf_spark.session import get_spark

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def assert_df_parity(spark_df, duck_df: pd.DataFrame, check_dtype: bool = False):
    """Order-insensitive frame equality (the driver's comparison model)."""
    sdf = spark_df.toPandas()
    assert list(sdf.columns) == list(duck_df.columns), (
        f"column mismatch: {list(sdf.columns)} vs {list(duck_df.columns)}"
    )
    key = list(sdf.columns)
    s = sdf.sort_values(key, na_position="first").reset_index(drop=True)
    d = duck_df.sort_values(key, na_position="first").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, d, check_dtype=check_dtype)

from __future__ import annotations

import pytest

from twitch_stream_data_pipeline_spark.compat import ensure_protobuf
from twitch_stream_data_pipeline_spark.session import get_spark

# Must run before any SparkSession exists: Python workers inherit
# PYTHONPATH at session start, and transformWithStateInPandas workers
# need google.protobuf (wired from the system's vendored copy when no
# protobuf distribution is installed — see compat.ensure_protobuf).
ensure_protobuf()

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con

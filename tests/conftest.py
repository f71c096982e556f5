from __future__ import annotations

import numpy as np
import pytest

from spark_aknn.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spark_aknn_tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_points_df(spark, ids, xs, ys):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"id": np.asarray(ids, dtype=np.int64), "x": xs, "y": ys}),
        "id long, x double, y double",
    )

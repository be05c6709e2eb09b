"""Salted skew-join: result identity with the plain join across the
salt-safe join types, and rejection of salt-unsafe ones."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from clinical_data_lake_spark.operators.joins import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key 1 (90% of rows) + a right side with extra and missing keys
    left = spark.createDataFrame(
        [Row(k=1, v=i) for i in range(90)]
        + [Row(k=2, v=900), Row(k=3, v=901)]
    )
    right = spark.createDataFrame(
        [Row(k=1, name="hot"), Row(k=2, name="cold"), Row(k=9, name="orphan")]
    )
    return left, right


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain(spark, skewed, how):
    left, right = skewed
    got = salted_join(left, right, on="k", salt=4, how=how)
    want = left.join(right, on="k", how=how)
    assert sorted(got.columns) == sorted(want.columns)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_salted_join_rejects_right_outer(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(left, right, on="k", how="right")

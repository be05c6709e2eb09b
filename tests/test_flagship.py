from __future__ import annotations

from clinical_data_lake_spark.flagship import flagship

from conftest import SF_SMALL


def test_flagship_runs(spark):
    df = flagship(spark, SF_SMALL)
    rows = df.collect()
    assert 0 < len(rows) <= 3
    assert set(df.columns) == {"event_type", "cnt"}
    # index label excluded from its own comorbidity list
    assert all(r["event_type"] != "click" for r in rows)
    # descending by count
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)

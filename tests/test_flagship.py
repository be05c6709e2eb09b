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


def test_strip_markup_closed_form(spark):
    from pyspark.sql import functions as F  # noqa: F811

    from clinical_data_lake_spark.functions.text import strip_markup

    rows = [
        ('<p>Hello <a href="https://x.io/y?z=1">world</a></p>', "Hello world"),
        ("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;", "a & b <tag> \"q\" 's'"),
        ("see https://example.com/path now", "see now"),
        ("  spaced\t\tout\n\nlines  ", "spaced out lines"),
    ]
    df = spark.createDataFrame(rows, ["raw", "expected"])
    out = df.select(strip_markup("raw").alias("got"), "expected").collect()
    for r in out:
        assert r.got == r.expected, (r.got, r.expected)

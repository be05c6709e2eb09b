"""End-to-end reference-workflow parity: the full 02-patient-trajectory
flow (cohort -> comorbid labels -> featurize -> split -> train -> tune
-> evaluate -> score) composed from this library on driver testdata —
the 'a user of the reference could switch' proof, as one test.

Reference chain: 02-patient-trajectory.py:53 (cohort SQL) -> :57-63
(comorbid conditions) -> :73-87 (controls + union + split) ->
include/featurise.py:18-96 (features) -> :101-127 (train + evaluate) ->
03-work with ML models.py:110-121 (score + breakdown).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.io import read_table
from clinical_data_lake_spark.ml import featurize, stats, train
from clinical_data_lake_spark.operators import cohort as cohort_ops
from clinical_data_lake_spark.operators.caching import scoped_cache

from conftest import SF_SMALL


def test_reference_workflow_end_to_end(spark):
    ev = read_table(spark, SF_SMALL, "events")
    users = ev.select("user_id").distinct()

    # 1. case/control cohort (02-patient-trajectory.py:73-87)
    cc = cohort_ops.case_control_cohort(
        users, "user_id", ev, "user_id", "event_type", "click"
    )
    n_cases = cc.filter("label = 1").count()
    n_controls = cc.filter("label = 0").count()
    assert n_cases > 0 and n_controls <= n_cases

    # 2. comorbid-label list for featurization (:57-63)
    case_ids = cc.filter("label = 1").select("user_id")
    top = featurize.top_cooccurring_labels(ev, case_ids, "user_id", "event_type", k=3)
    needles = [r.event_type for r in top.collect()]
    assert len(needles) == 3

    # 3. featurize + seeded split + train + tune + evaluate
    with scoped_cache(cc) as (cc_cached,):
        feats, indexers = featurize.featurize_events(
            ev, cc_cached.select("user_id"), "user_id", "event_type", "ts",
            flag_needles=["click"] + needles[:2], days=7, assemble=True,
        )
        train_df, test_df = featurize.seeded_split(feats, 0.7, seed=42)
        model = train.train_decision_tree(train_df, max_depth=4)
        auc = train.evaluate_auc(model, test_df)
        assert 0.0 <= auc <= 1.0

        tvs = train.tune_decision_tree(
            train_df, max_depths=(3, 5), max_binses=(16,), impurities=("gini",)
        )
        assert len(tvs.validationMetrics) == 2

        # 4. batch score + breakdown (03-work with ML models.py:110-121)
        breakdown = train.score_with_breakdown(
            tvs.bestModel, feats, ["event_type"], prediction_value=None
        )
        rows = breakdown.collect()
        assert sum(r.cnt for r in rows) == feats.count()

    # 5. chi-square association between two event types (01-rwe-dashboard.r)
    a_ids = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    b_ids = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    chi = stats.chisq_2x2(users, "user_id", a_ids, b_ids).collect()[0]
    assert chi.n_11 + chi.n_10 + chi.n_01 + chi.n_00 == users.count()
    p = stats.pvalue_1dof(chi.chi2)
    assert 0.0 <= p <= 1.0

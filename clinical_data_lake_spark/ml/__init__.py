"""ML / statistics surface (SURVEY.md §2.11 M1-M8, §2.10 R1).

- ``featurize`` — the reference's featurization pipeline
  (include/featurise.py:18-96) rebuilt: one-select comorbidity flags,
  shared-shuffle rolling windows, StringIndexer fit/reuse,
  VectorAssembler, seeded split.
- ``stats`` — distributed chi-square association (replacing the R
  driver-side collect, 01-rwe-dashboard.r:110-124).
- ``train`` — DecisionTree + evaluator + TrainValidationSplit tuning +
  a storage-agnostic model store (include/featurise.py:101-127,
  03-work with ML models.py:107-140).
"""

from . import featurize, stats, train

__all__ = ["featurize", "stats", "train"]

"""clinical_data_lake_spark — a PySpark-native analytics engine.

A ground-up rebuild of the query and data-processing capabilities of the
reference clinical RWE data lake (``rishisanalytics/clinical-data-lake``:
four Databricks notebooks + one include, see SURVEY.md), re-expressed as an
idiomatic, testable PySpark library:

- ``session``    — SparkSession factory (AQE on, ANSI on, deterministic
                   configs).
- ``io``         — parquet/delta/CSV sources & sinks, view registration.
- ``catalog``    — DDL + table maintenance (CREATE DATABASE/TABLE, DROP,
                   OPTIMIZE ZORDER with clustered-parquet fallback,
                   DESCRIBE HISTORY guard).
- ``operators``  — relational operator library (projections, filters,
                   joins, aggregates, sorts/top-k, set ops, windows,
                   cohort analytics, deterministic hash sampling/splits).
- ``functions``  — scalar column functions (de-identification hashing,
                   null fill, date math, JSON extraction, text analysis).
- ``etl``        — the clinical ETL pipeline (ingest → de-identify →
                   denormalize → optimize), Synthea-shaped.
- ``ml``         — featurization (comorbidity flags + rolling windows +
                   indexing), training, chi-square association.
- ``llm``        — LLM-data-pipeline extensions: dedup (exact/MinHash/
                   SimHash/Jaccard + connected-component clustering),
                   similarity search, corpus cleaning, sequence packing,
                   multimodal column plumbing.
- ``streaming``  — Structured Streaming versions of the event-window
                   aggregations (batch-first so an oracle can check
                   them) plus watermarked sessionization.

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning and
join selection; Python UDFs are avoided in hot paths (the reference's one
Python UDF — SHA-1 PII hashing at ``00-etl-rwd.py:66-79`` — becomes the
built-in ``F.sha2``).
"""

__version__ = "0.1.0"

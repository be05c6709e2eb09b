"""ETL pipeline (SURVEY.md §3.1) — the reference's 00-etl-rwd.py
end-to-end composed from the operator library."""

from .pipeline import TableSpec, run_etl

__all__ = ["TableSpec", "run_etl"]

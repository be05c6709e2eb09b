from .audit import audit_plan, explain_findings  # noqa: F401

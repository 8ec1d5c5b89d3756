from .audit import explain_str, plan_report  # noqa: F401

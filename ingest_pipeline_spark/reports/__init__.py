from .survey import customer_survey, usage_report  # noqa: F401

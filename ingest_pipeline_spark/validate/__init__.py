from .checks import Check, run_checks, violation_counts  # noqa: F401

from .checks import Check, CheckRegistry, route_violations, run_checks, violation_counts  # noqa: F401

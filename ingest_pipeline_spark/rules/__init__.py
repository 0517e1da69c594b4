from .engine import Rule, first_match_case, rules_broadcast_join, map_fallback  # noqa: F401

from .reorganize import reorganize_two_phase  # noqa: F401

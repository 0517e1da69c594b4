from .events import windowed_event_counts, run_stream_once, dedup_stream  # noqa: F401

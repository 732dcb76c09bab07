from .events import streaming_hourly_agg  # noqa: F401

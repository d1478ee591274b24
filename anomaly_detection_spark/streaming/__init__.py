from .jobs import realtime_feature_stream  # noqa: F401

from .jobs import realtime_feature_stream  # noqa: F401
from .stateful import streaming_detector, streaming_shingles  # noqa: F401

"""Structured-Streaming surface (SURVEY §2.10).

The reference is batch-only; the long event-time format this engine
uses is streaming-compatible by construction, so the detect scoring
stage ports directly: broadcast the (doy, cell) climatology +
threshold tables built in batch, score arriving observations
stream-side, window-aggregate extreme coverage with watermarked event
time.
"""

from marex_spark.streaming.detect import (  # noqa: F401
    score_stream,
    streaming_area_history,
)
from marex_spark.streaming.track import (  # noqa: F401
    streaming_extreme_episodes,
)

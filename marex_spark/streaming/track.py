"""Stateful streaming episode tracking (SURVEY §2.10's design note: the
time-sequential tracking loop maps to a keyed state machine —
``applyInPandasWithState`` keyed by cell).

``streaming_extreme_episodes`` turns a scored extreme-cell stream into
closed *episodes* per cell: contiguous runs of extreme days separated
by more than ``gap_days``. This is the per-cell (M3-adjacent) primitive
of event tracking in streaming form; spatial linking of concurrent
episodes runs as the batch tracker over the emitted episode table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("y", IntegerType()),
        StructField("x", IntegerType()),
        StructField("episode_start", TimestampType()),
        StructField("episode_end", TimestampType()),
        StructField("n_days", LongType()),
    ]
)
# open-episode state: (start_epoch_day, last_epoch_day, n_days)
_STATE_SCHEMA = StructType(
    [
        StructField("start_day", LongType()),
        StructField("last_day", LongType()),
        StructField("n_days", LongType()),
    ]
)


def _episode_fn(gap_days: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        y, x = key
        if state.hasTimedOut:
            # watermark passed the open episode's allowed gap: the cell
            # went quiet, so the episode is closed by definition — emit
            # it and drop the state entry (bounds state size and emits
            # trailing episodes, which NoTimeout never would).
            start_day, last_day, n_days = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "y": [y],
                    "x": [x],
                    "episode_start": pd.to_datetime([start_day * 86_400_000_000_000]),
                    "episode_end": pd.to_datetime([last_day * 86_400_000_000_000]),
                    "n_days": [n_days],
                }
            )
            return
        if state.exists:
            start_day, last_day, n_days = state.get
        else:
            start_day = last_day = None
            n_days = 0

        closed = []
        days = sorted(
            {
                int(d)
                for pdf in pdfs
                for d in (pdf["time"].astype("int64") // 86_400_000_000_000)
            }
        )
        for d in days:
            if last_day is None:
                start_day, last_day, n_days = d, d, 1
            elif d - last_day <= gap_days:
                if d > last_day:
                    n_days += 1
                    last_day = d
            else:
                closed.append((start_day, last_day, n_days))
                start_day, last_day, n_days = d, d, 1
        if last_day is not None:
            state.update((start_day, last_day, n_days))
            # flush when the watermark passes the end of the allowed gap
            # (clamped above the current watermark — Spark rejects a
            # timeout at or behind it, which a straggler cell could hit)
            tmo = (last_day + gap_days + 1) * 86_400_000
            state.setTimeoutTimestamp(max(tmo, state.getCurrentWatermarkMs() + 1))

        if closed:
            yield pd.DataFrame(
                {
                    "y": y,
                    "x": x,
                    "episode_start": pd.to_datetime(
                        [c[0] * 86_400_000_000_000 for c in closed]
                    ),
                    "episode_end": pd.to_datetime(
                        [c[1] * 86_400_000_000_000 for c in closed]
                    ),
                    "n_days": [c[2] for c in closed],
                }
            )

    return fn


def streaming_extreme_episodes(
    extreme_cells: DataFrame,
    gap_days: int = 2,
    watermark_delay: str = "3 days",
) -> DataFrame:
    """Per-cell stateful episode detection over a stream of extreme
    cells (time, y, x). Emits an episode once a later extreme at the
    same cell arrives more than ``gap_days`` after it ended, OR once
    the event-time watermark passes the episode's allowed gap (the
    streaming analogue of the reference's temporal gap rule,
    track.py:1675-1726). Open episodes live in keyed state; the
    event-time timeout bounds state size and guarantees trailing
    episodes are emitted. Rows later than ``watermark_delay`` are
    dropped by the watermark (bounded, documented lateness)."""
    return (
        extreme_cells.withWatermark("time", watermark_delay)
        .groupBy("y", "x")
        .applyInPandasWithState(
            _episode_fn(gap_days),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

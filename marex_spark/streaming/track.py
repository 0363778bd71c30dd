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
) -> DataFrame:
    """Per-cell stateful episode detection over a stream of extreme
    cells (time, y, x). Emits an episode once a later extreme at the
    same cell arrives more than ``gap_days`` after it ended (the
    streaming analogue of the reference's temporal gap rule,
    track.py:1675-1726). Open episodes live in keyed state."""
    return extreme_cells.groupBy("y", "x").applyInPandasWithState(
        _episode_fn(gap_days),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

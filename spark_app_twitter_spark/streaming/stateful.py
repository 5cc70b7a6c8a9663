"""Custom stateful streaming operator: applyInPandasWithState.

Built-ins cover windows/dedup; arbitrary per-key state (running
totals, EMAs, session models with custom logic) needs the escape
hatch. This operator keeps a running (count, sum) per topic across
micro-batches and emits the cumulative row each time the key appears
— the pattern any bespoke stateful enrichment follows:

- state is per-key and checkpointed: recoverable, bounded by |keys|;
- batches arrive as Arrow pandas frames (vectorized accumulation);
- timeouts (here: none) are where idle-state eviction plugs in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("count", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("running_count", T.LongType()),
        T.StructField("running_total", T.DoubleType()),
        T.StructField("running_avg", T.DoubleType()),
    ]
)


def _accumulate(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    count, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["value"].sum())
    state.update((count, total))
    yield pd.DataFrame(
        {
            "topic": [key[0]],
            "running_count": [count],
            "running_total": [round(total, 2)],
            "running_avg": [round(total / count, 6) if count else None],
        }
    )


def running_topic_stats(events: DataFrame) -> DataFrame:
    """Streaming (or batch) events -> cumulative per-topic stats.

    Input needs columns ``topic`` (string) and ``value`` (double).
    Update output mode: one row per (topic, micro-batch touched).
    """
    return events.groupBy("topic").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

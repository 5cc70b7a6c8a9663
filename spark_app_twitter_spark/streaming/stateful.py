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


# ---------------------------------------------------------------------------
# Second stateful shape: per-row admission decisions against per-key
# running state (vs running_topic_stats' per-key aggregate output).
# The training-data use: admit arriving documents per source until
# that source's token budget is spent — the streaming half of
# textstats.token_budget_sample, with the cumulative token count as
# checkpointed state instead of a window over a static corpus.

ADMIT_STATE_SCHEMA = T.StructType(
    [T.StructField("used_tokens", T.LongType())]
)

ADMIT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_tok", T.LongType()),
        T.StructField("admitted", T.BooleanType()),
    ]
)


def _admit_factory(budget: int):
    def admit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (used,) = state.get if state.exists else (0,)
        # Arrow hands a group as MULTIPLE chunks in arbitrary row
        # order; sorting each chunk alone would charge the budget in
        # chunk order, not doc order. Concatenate the group's batch
        # slice first, then sort ONCE — the buffer is one key's rows
        # within one micro-batch (the unit the state contract already
        # holds in memory), not the stream.
        whole = pd.concat(list(pdfs), ignore_index=True)
        whole = whole.sort_values("doc_id")
        toks = (
            whole["text"]
            .fillna("")  # null text counts like F.split('') (one
            # empty token) instead of crashing the query
            .str.split(" ")
            .map(len)
            .astype("int64")
        )
        admitted = []
        for t in toks:
            ok = used + int(t) <= budget
            if ok:
                used += int(t)
            admitted.append(ok)
        state.update((used,))
        yield pd.DataFrame(
            {
                "doc_id": whole["doc_id"].astype("int64"),
                "source": key[0],
                "n_tok": toks,
                "admitted": admitted,
            }
        )

    return admit


def token_budget_admission(docs: DataFrame, budget: int) -> DataFrame:
    """Streaming docs (doc_id, source, text) -> one admission row per
    doc: admitted=true while the source's cumulative admitted tokens
    stay within ``budget``. State is ONE long per source —
    checkpointed, so restarts resume the budget, and replays of a
    committed batch recompute the same decisions (within-batch order
    is pinned to doc_id ascending).
    """
    return docs.groupBy("source").applyInPandasWithState(
        _admit_factory(budget),
        outputStructType=ADMIT_OUTPUT_SCHEMA,
        stateStructType=ADMIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Third stateful shape: per-key FIRST-SEEN detection — the streaming
# half of serving.new_vs_returning. State is one string (the user's
# first active day); each (user, day) touch emits whether that day is
# the user's first. With day-ordered arrival (the micro-batch replay
# contract) the stream's per-day new/returning counts equal the batch
# query exactly; out-of-order arrival shifts "new" to the earliest
# SEEN day — the documented watermark-less trade.

FIRST_SEEN_STATE_SCHEMA = T.StructType(
    [T.StructField("first_day", T.StringType())]
)

FIRST_SEEN_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("day", T.StringType()),
        T.StructField("is_new", T.BooleanType()),
    ]
)


def _first_seen(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    first = state.get[0] if state.exists else None
    whole = pd.concat(list(pdfs), ignore_index=True)
    days = sorted(set(whole["day"].astype(str)))
    out = {"user_id": [], "day": [], "is_new": []}
    for d in days:
        if first is None:
            first = d
        out["user_id"].append(int(key[0]))
        out["day"].append(d)
        out["is_new"].append(d == first)
    state.update((first,))
    yield pd.DataFrame(out)


def first_seen_users(events: DataFrame) -> DataFrame:
    """Streaming events (user_id long, day string) -> one row per
    (user, day) touched per micro-batch with the new/returning
    verdict. State is ONE string per user — checkpointed, so
    restarts keep every user's first-seen day and replays of a
    committed batch re-emit identical verdicts.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _first_seen,
        outputStructType=FIRST_SEEN_OUTPUT_SCHEMA,
        stateStructType=FIRST_SEEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Custom stateful streaming operator: per-user first-seen dedup.

``session_window``/watermarked aggs cover windowed state (streaming/
rollup.py); this is the case Spark has no built-in for — emit only the
FIRST occurrence of each (user, event_type), forever, with the seen-set as
explicit state. Implemented with ``applyInPandasWithState`` (Arrow-batched
per-group state function), per the preference order in SURVEY.md §2.5:
built-ins first, grouped Pandas state only where built-ins can't express
the semantics.

State per user is the set of seen event types — bounded by the type
vocabulary, so the state store stays O(users × types) regardless of stream
length; the batch twin (row_number = 1 per (user, type)) is the replay.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])


def first_seen_stream(events: DataFrame) -> DataFrame:
    """events stream → first (user, event_type) occurrences, stateful.

    The state function is NESTED so cloudpickle serializes it BY VALUE: a
    module-level function pickles by reference, and Python workers (which
    don't import this package) would die with ModuleNotFoundError — found
    by driving the stream from a foreign cwd. Rule for every UDF in this
    package: define the worker-side function inside the operator.
    """
    out_cols = [f.name for f in OUTPUT_SCHEMA.fields]

    def first_seen(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: set[str] = set(state.get[0]) if state.exists else set()
        out: list[dict[str, Any]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for row in pdf.itertuples(index=False):
                if row.event_type not in seen:
                    seen.add(row.event_type)
                    out.append(
                        {
                            "user_id": row.user_id,
                            "event_type": row.event_type,
                            "first_ts": row.ts,
                            "event_id": row.event_id,
                        }
                    )
        state.update((sorted(seen),))
        yield pd.DataFrame(out, columns=out_cols)

    return events.groupBy("user_id").applyInPandasWithState(
        first_seen,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

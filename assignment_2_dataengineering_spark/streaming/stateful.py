"""Arbitrary stateful streaming: running bounded top-k per key — the
streaming twin of the batch bounded-retention top-k
(operators/relational.py topk_retention, reference
dashboard.py:330-340's "keep the latest 5000" buffer). State per key
is EXACTLY k values + one counter, so state size is bounded by
k × |keys| regardless of stream length — the property that makes it
safe on an unbounded 100 TB/day stream.

Two implementations of the same semantics:

- `running_topk` — applyInPandasWithState (one state tuple per key);
  runs everywhere Spark 4 runs; e2e-tested against the batch oracle
  in tests/test_stateful.py.
- `running_topk_tws` — transformWithStateInPandas, Spark 4's successor
  API with named/typed state variables and independent lifecycles.
  Its state protocol needs the `protobuf` package, absent from this
  container, so the implementation is a gated seam (import-checked,
  skip-tested) kept as the forward-looking form.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # transformWithState needs google.protobuf at runtime
    import google.protobuf  # noqa: F401

    HAS_PROTOBUF = True
except ImportError:
    HAS_PROTOBUF = False

from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("topk", T.ArrayType(T.DoubleType())),
    ]
)


def running_topk(
    events: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
    k: int = 5,
) -> DataFrame:
    """Per-key running top-k via applyInPandasWithState.

    State: (sorted-desc top-k list, total seen) per key. Each
    micro-batch merges its values into the retained list and re-emits
    the key's current top-k — update semantics, the latest emission
    per key (highest n_seen) is the answer so far. The merge is
    associative and commutative over batches, so micro-batch
    boundaries cannot change the result (pinned against the batch
    oracle in tests/test_stateful.py)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    state_schema = T.StructType(
        [
            T.StructField("vals", T.ArrayType(T.DoubleType())),
            T.StructField("n_seen", T.LongType()),
        ]
    )

    def merge(key_tuple, pdfs, state: GroupState):
        vals, n_seen = (
            (list(state.get[0]), int(state.get[1])) if state.exists else ([], 0)
        )
        for pdf in pdfs:
            # NaN/null are DROPPED, not ranked: plain sorted() leaves
            # NaN unordered (corrupting the retained list and making
            # the merge batch-boundary-dependent), and the
            # pandas→Arrow boundary conflates NaN with null anyway, so
            # a NaN could not round-trip through state or the output
            col = pdf[value_col].astype(float).dropna()
            xs = col.tolist()
            n_seen += len(xs)
            vals = sorted(vals + xs, reverse=True)[:k]
        state.update((vals, n_seen))
        yield pd.DataFrame({"key": [key_tuple[0]], "n_seen": [n_seen], "topk": [vals]})

    return (
        events.select(F.col(key).alias("key"), F.col(value_col))
        .groupBy("key")
        .applyInPandasWithState(
            merge, _OUT_SCHEMA, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


class RunningTopK(StatefulProcessor):
    """Per-key running top-k of a numeric column.

    State: one ValueState holding (sorted-desc top-k list, total seen).
    Each micro-batch merges the batch's values into the retained list
    and re-emits the key's current top-k — update semantics, so the
    latest emission per key is the answer so far. Merging is
    associative: processing order across batches cannot change the
    result (pinned against the batch oracle in tests/test_stateful.py).
    """

    def __init__(self, k: int = 5, value_col: str = "value") -> None:
        self.k = k
        self.value_col = value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "topk", "vals array<double>, n_seen bigint"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        existing = self._state.get()
        vals, n_seen = (
            (list(existing[0]), int(existing[1])) if existing else ([], 0)
        )
        for pdf in rows:
            # NaN/null dropped — see running_topk
            xs = pdf[self.value_col].astype(float).dropna().tolist()
            n_seen += len(xs)
            # merge + trim: state never exceeds k floats per key
            vals = sorted(vals + xs, reverse=True)[: self.k]
        self._state.update((vals, n_seen))
        yield pd.DataFrame(
            {"key": [key[0]], "n_seen": [n_seen], "topk": [vals]}
        )

    def close(self) -> None:
        pass


def running_topk_tws(
    events: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
    k: int = 5,
) -> DataFrame:
    """transformWithStateInPandas form of running_topk (same semantics,
    same output schema). Requires the RocksDB state store provider AND
    the protobuf package (the TWS state protocol) — raises ImportError
    with a clear message when protobuf is absent so callers can fall
    back to running_topk."""
    if not HAS_PROTOBUF:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package; "
            "use running_topk (applyInPandasWithState) instead"
        )
    return (
        events.select(F.col(key).alias("key"), F.col(value_col).alias(value_col))
        .groupBy("key")
        .transformWithStateInPandas(
            RunningTopK(k, value_col), _OUT_SCHEMA, "update", "none"
        )
    )


_DECAY_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("anchor_day", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("decayed_cents", T.DoubleType()),
    ]
)


def decayed_counter(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running exponential-decay score (half-life one day),
    anchored at the key's latest event day — the streaming twin of the
    batch q_decay_agg pattern, with EXACT batch-stream parity by
    construction.

    The decomposition that makes it incremental: with day-granular ages
    on the EPOCH-DAY grid, S = Σ cents_i · 2^(d_i − D) re-anchors by a
    pure power-of-two multiply when a later day D' arrives
    (S' = S · 2^(D−D') + new terms). Every term is a dyadic rational,
    so addition is exact and the result is independent of both
    micro-batch boundaries and within-batch order — asserted against
    the one-shot batch aggregate in tests/test_stateful.py. State per
    key: (anchor_day, n_seen, running sum) — three numbers, bounded
    forever."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    state_schema = T.StructType(
        [
            T.StructField("anchor_day", T.LongType()),
            T.StructField("n_seen", T.LongType()),
            T.StructField("dsum", T.DoubleType()),
        ]
    )

    def merge(key_tuple, pdfs, state: GroupState):
        import math

        if state.exists:
            anchor, n_seen, dsum = (
                int(state.get[0]),
                int(state.get[1]),
                float(state.get[2]),
            )
        else:
            anchor, n_seen, dsum = None, 0, 0.0
        for pdf in pdfs:
            days = (pdf[ts_col].astype("int64") // 86_400_000_000_000).tolist()
            cents = [math.floor(v * 100) for v in pdf[value_col].astype(float)]
            for d, c in zip(days, cents):
                if anchor is None:
                    anchor = d
                if d > anchor:
                    dsum = dsum * (2.0 ** (anchor - d))
                    anchor = d
                dsum += c * (2.0 ** (d - anchor))
                n_seen += 1
        state.update((anchor, n_seen, dsum))
        yield pd.DataFrame(
            {
                "key": [key_tuple[0]],
                "anchor_day": [anchor],
                "n_seen": [n_seen],
                "decayed_cents": [dsum / 100.0],
            }
        )

    return (
        events.select(F.col(key).alias("key"), ts_col, value_col)
        .groupBy("key")
        .applyInPandasWithState(
            merge, _DECAY_OUT_SCHEMA, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )

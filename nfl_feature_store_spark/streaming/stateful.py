"""Stateful streaming per-entity features via ``applyInPandasWithState``
(SURVEY.md §2.9 extension; the batch analog is operators/ewma.py).

The batch engine computes EWMA with one pandas pass per partition; under
Structured Streaming the recursion state (current EWM value + the previous
turn's raw value for the lag-1 input) must survive across micro-batches.
``applyInPandasWithState`` keys the stream by ``conv_id`` and hands each
key's new rows to a vectorized pandas kernel together with its ``GroupState``
— state size is O(metrics) per conversation, the smallest possible.

Ordering contract: turns must arrive ts-ordered per conversation ACROSS
micro-batches (within a batch the kernel sorts). Out-of-order delivery
within the watermark collapses via upstream dedup; rows older than a
previously processed turn would recurse from the wrong state, so transports
that reorder beyond the watermark need the batch backfill path instead —
the same late-data boundary the session aggregates draw.

State eviction (round-4 VERDICT item 3): both kernels carry ``state_ttl``
(default 30 days) — an EVENT-TIME timeout anchored at each conversation's
latest turn. When the stream's watermark passes ``last_turn_ts + ttl`` and
the conversation has received no new data, its state is REMOVED — without
this, the state store grows monotonically with every conversation ever
seen (unbounded at 10^9 conversations); with it, state size tracks the
ACTIVE conversation set. Resume-on-reappearance semantics (documented
contract): an evicted conversation that produces a new turn restarts its
recursion from scratch — EWMA reseeds from the first new lag value (its
first new row emits NULL), Elo re-initializes at ``init``. For workloads
that must survive arbitrary idle gaps, reseed from the batch engine's
latest-snapshot table at startup instead of raising the TTL toward
infinity. ``state_ttl=None`` restores the old keep-forever behavior.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _ttl_ms(state_ttl: str | None) -> int | None:
    if state_ttl is None:
        return None
    ms = int(pd.Timedelta(state_ttl).total_seconds() * 1000)
    if ms <= 0:
        raise ValueError(f"state_ttl must be a positive duration, got {state_ttl!r}")
    return ms


def streaming_ewma(
    turns: DataFrame,
    metrics: tuple[str, ...] = ("chars",),
    span: int = 10,
    watermark: str = "2 hours",
    state_ttl: str | None = "30 days",
) -> DataFrame:
    """Streaming span-EWM of the lag-1 metric series per conversation.

    Emits one row per turn: ``(conv_id, turn_idx, ts, ewma_{m}...)`` where
    ``ewma_{m}`` is the EWM of metric ``m`` over all STRICTLY EARLIER turns
    (NULL until a second turn exists) — identical semantics to the batch
    ``with_ewma``, state carried across micro-batches.

    ``turns`` must already carry the metric columns (e.g. from
    ``with_turn_metrics``); duplicates should be collapsed upstream
    (``dropDuplicatesWithinWatermark``).
    """
    alpha = 2.0 / (span + 1.0)
    out_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("ts", T.TimestampType(), False),
        ]
        + [T.StructField(f"ewma_{m}", T.DoubleType(), True) for m in metrics]
    )
    # per metric: (ewm value, seeded flag, previous raw value, has_prev flag)
    state_schema = T.StructType(
        [T.StructField(f, T.DoubleType(), True) for m in metrics for f in (f"e_{m}", f"x_{m}")]
        + [T.StructField("n_seen", T.LongType(), True)]
    )

    ttl_ms = _ttl_ms(state_ttl)

    def kernel(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle past TTL: evict. A later reappearance restarts the
            # recursion (module docstring resume contract).
            state.remove()
            return
        if state.exists:
            st = list(state.get)
        else:
            st = [None] * (2 * len(metrics)) + [0]
        n_seen = int(st[-1] or 0)
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "turn_idx"], kind="mergesort", ignore_index=True
        )
        out = {"conv_id": pdf["conv_id"], "turn_idx": pdf["turn_idx"], "ts": pdf["ts"]}
        for j, m in enumerate(metrics):
            e, x_prev = st[2 * j], st[2 * j + 1]
            vals = pdf[m].astype("float64").to_numpy()
            col = []
            for x in vals:
                if x_prev is not None:  # update with the lag-1 value first
                    e = x_prev if e is None else e + alpha * (x_prev - e)
                col.append(e)
                x_prev = float(x)
            st[2 * j], st[2 * j + 1] = e, x_prev
            out[f"ewma_{m}"] = col
        st[-1] = n_seen + len(pdf)
        state.update(tuple(st))
        if ttl_ms is not None:
            # anchor at the newest turn: rows behind the watermark are
            # dropped upstream, so max(ts) > watermark and the target is
            # always a legal (future-of-watermark) timeout
            state.setTimeoutTimestamp(int(pdf["ts"].max().value // 1_000_000) + ttl_ms)
        yield pd.DataFrame(out)

    keyed = turns.withWatermark("ts", watermark).groupBy("conv_id")
    timeout = (
        GroupStateTimeout.NoTimeout if ttl_ms is None else GroupStateTimeout.EventTimeTimeout
    )
    return keyed.applyInPandasWithState(kernel, out_schema, state_schema, "append", timeout)


def streaming_elo(
    turns: DataFrame,
    outcome_col: str = "outcome",
    k: float = 20.0,
    init: float = 1500.0,
    opponent_rating: float = 1500.0,
    watermark: str = "2 hours",
    state_ttl: str | None = "30 days",
) -> DataFrame:
    """Streaming per-entity Elo (operators/elo.py elo_per_entity semantics):
    ``elo_pre`` is the rating BEFORE each event; NULL outcomes pass through
    without updating. State = one double per conversation, carried across
    micro-batches. Same ordering contract as :func:`streaming_ewma`."""
    out_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("elo_pre", T.DoubleType(), False),
        ]
    )
    state_schema = T.StructType([T.StructField("r", T.DoubleType(), True)])

    ttl_ms = _ttl_ms(state_ttl)

    def kernel(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # reappearance re-initializes at `init`
            return
        r = state.get[0] if state.exists else init
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "turn_idx"], kind="mergesort", ignore_index=True
        )
        pre = []
        for o in pdf[outcome_col].astype("float64"):
            pre.append(r)
            if o == o:  # not NaN
                expected = 1.0 / (1.0 + 10.0 ** (-(r - opponent_rating) / 400.0))
                r = r + k * (o - expected)
        state.update((r,))
        if ttl_ms is not None:
            state.setTimeoutTimestamp(int(pdf["ts"].max().value // 1_000_000) + ttl_ms)
        yield pd.DataFrame(
            {"conv_id": pdf["conv_id"], "turn_idx": pdf["turn_idx"], "ts": pdf["ts"], "elo_pre": pre}
        )

    keyed = turns.withWatermark("ts", watermark).groupBy("conv_id")
    timeout = (
        GroupStateTimeout.NoTimeout if ttl_ms is None else GroupStateTimeout.EventTimeTimeout
    )
    return keyed.applyInPandasWithState(kernel, out_schema, state_schema, "append", timeout)

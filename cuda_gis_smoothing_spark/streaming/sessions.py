"""Streaming sessionization — the stateful twin of
operators/events.py::sessionize (gap-based sessions, batch-gated).

A session closes when the WATERMARK passes its last event plus the
gap (EventTimeTimeout): emission is driven by data timestamps, so a
replay emits the identical sessions (batch-equality is pytest-gated
against the batch operator over the same events).

Semantics vs batch (the watermark contract, stated not hidden):
  * an event later than its user's open session but within the gap
    MERGES into it, even across micro-batches;
  * an event arriving AFTER the watermark already closed its session
    (possible when other users' events advance the watermark while
    this user's next event is within the gap but late relative to the
    stream) starts a NEW session — batch, with hindsight, would have
    merged it. That split is exactly what the watermark delay
    parameter trades against state size, the same contract windowed
    aggregations give late data.

State: ONE tiny row per user (seq counter + open-session aggregates);
closed state lingers as a (seq, last_us) marker so session_seq keeps
counting across sessions — bounded by user cardinality, the digest
argument from streaming dedup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cuda_gis_smoothing_spark.operators.events import SESSION_GAP_US


def sessionize_stream(
    events: DataFrame,
    gap_us: int = SESSION_GAP_US,
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
    marker_ttl_us: int | None = None,
) -> DataFrame:
    """Emit (user_id, session_seq, start_us, n_events, sum_value) rows
    as sessions CLOSE (watermark > last event + gap). Apply
    ``functions.numeric.round6`` on sum_value downstream when comparing
    cross-engine.

    ``marker_ttl_us`` bounds state for unbounded user populations: a
    CLOSED user's marker is garbage-collected once the watermark passes
    its last event plus the TTL — state becomes "users active within a
    TTL window" instead of every user ever, at the documented cost that
    a user returning after the TTL restarts session_seq at 1 (the same
    horizon trade the dedup TTL makes). Default None keeps markers
    forever (seq never resets)."""
    from cuda_gis_smoothing_spark.streaming.dedup import require_utc_session

    require_utc_session(events, "sessionize_stream")

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        if state.exists:
            seq, start, last, n, sv, is_open = state.get
        else:
            seq, start, last, n, sv, is_open = 0, 0, 0, 0, 0.0, 0
        out = []
        if state.hasTimedOut:
            if is_open:
                out.append((user, seq, start, n, sv))
                # closed marker lingers so session_seq keeps counting;
                # with a marker TTL it is GC'd after idling past it
                state.update((seq, start, last, n, sv, 0))
                if marker_ttl_us is not None:
                    wm = state.getCurrentWatermarkMs()
                    state.setTimeoutTimestamp(
                        max((last + marker_ttl_us) // 1000, wm + 1)
                    )
            else:
                # marker-TTL expiry for an already-closed user
                state.remove()
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "session_seq", "start_us", "n_events", "sum_value"
                ],
            )
            return
        # concat BEFORE sorting: a group larger than the Arrow batch
        # size arrives as several chunks in shuffle order — per-chunk
        # sorting would evaluate gaps out of order
        chunks = list(pdfs)
        batch = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if not batch.empty:
            for r in batch.sort_values([ts_col, "event_id"]).itertuples(
                index=False
            ):
                us = int(getattr(r, ts_col).value // 1_000)  # ns -> us
                if not is_open:
                    # reset `last` too: a session reopened after a
                    # timeout close must not inherit the closed
                    # session's clock for its gap checks and deadline
                    seq, start, last, n, sv, is_open = (
                        seq + 1, us, us, 0, 0.0, 1,
                    )
                elif us - last > gap_us:
                    out.append((user, seq, start, n, sv))
                    seq, start, last, n, sv = seq + 1, us, us, 0, 0.0
                n += 1
                # NULL values arrive as NaN: batch sessionize's
                # F.sum("value") skips them (counting the row), so the
                # stream must too or one NULL poisons the session sum
                if pd.notna(r.value):
                    sv += float(r.value)
                last = max(last, us)
        state.update((seq, start, last, n, sv, is_open))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max((last + gap_us) // 1000, wm + 1))
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_seq", "start_us", "n_events", "sum_value"],
        )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .select("user_id", "event_id", ts_col, "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=(
                "user_id long, session_seq long, start_us long, "
                "n_events long, sum_value double"
            ),
            stateStructType=(
                "seq long, start_us long, last_us long, n long, "
                "sv double, open int"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

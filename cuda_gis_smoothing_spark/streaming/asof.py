"""Streaming as-of join: the stateful twin of the gated batch
operator (operators/events.py::asof_attribute).

Per-user GroupState carries the most recent right-side (click) event;
each left-side (purchase) event emits its attribution as it arrives.
Within a micro-batch rows are processed in exact event order
(us, side, event_id) — identical to the batch window's ordering, so a
time-ordered stream reproduces the batch result row-for-row (tested).
Cross-batch LATE right-side events cannot retro-attribute purchases
already emitted (streaming semantics: attribution is frozen at emit
time); bound lateness with a watermark + delayed emission if that
matters for the workload.

State at 100 TB: one (click_id, value, us) triple per user — bounded
by user cardinality; shuffle key is user_id, the same key every other
event operator uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cuda_gis_smoothing_spark.operators.events import event_micros


def asof_attribute_stream(
    events: DataFrame, left_type: str = "purchase", right_type: str = "click"
) -> DataFrame:
    """Emit (purchase_id, user_id, click_id, click_value, gap_us) for
    every left event, attributed to the latest right event at-or-before
    it seen so far (inclusive, ties to max event_id — the batch
    operator's exact tie-break)."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cid, cval, cus = state.get
        else:
            cid, cval, cus = None, None, None
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["us", "side", "event_id"])
        out = []
        for r in pdf.itertuples(index=False):
            if r.side == 0:  # right (click): carry forward
                cid, cval, cus = int(r.event_id), float(r.value), int(r.us)
            else:  # left (purchase): attribute
                gap = None if cus is None else int(r.us) - cus
                out.append((int(r.event_id), int(key[0]), cid, cval, gap))
        state.update((cid, cval, cus))
        yield pd.DataFrame(
            out,
            columns=["purchase_id", "user_id", "click_id", "click_value", "gap_us"],
        )

    base = events.where(
        F.col("event_type").isin([left_type, right_type])
    ).select(
        "event_id",
        "user_id",
        "value",
        event_micros("ts").alias("us"),
        # itertuples mangles underscore-prefixed names — keep it "side"
        (F.col("event_type") == left_type).cast("int").alias("side"),
    )
    return base.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=(
            "purchase_id long, user_id long, click_id long, "
            "click_value double, gap_us long"
        ),
        stateStructType="cid long, cval double, cus long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

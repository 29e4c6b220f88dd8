"""The streaming as-of join over a time-ordered stream must reproduce
the gated batch operator row-for-row — including state carried across
micro-batches and across a checkpointed restart."""

import pandas as pd

from cuda_gis_smoothing_spark.operators.events import asof_attribute
from cuda_gis_smoothing_spark.streaming.asof import asof_attribute_stream
from cuda_gis_smoothing_spark.streaming.windows import EVENTS_SCHEMA

SF_DIR = "/root/testdata/sf0.001"


def _norm(pdf):
    return (
        pdf.sort_values("purchase_id")
        .reset_index(drop=True)
        .astype({"click_id": "float64", "click_value": "float64", "gap_us": "float64"})
    )


def test_streaming_asof_equals_batch_across_restart(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ordered = events.orderBy("ts", "event_id").toPandas()
    mid = len(ordered) // 2
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")

    rows = []

    def sink(df, _bid):
        rows.extend(df.collect())

    def run():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            asof_attribute_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # batch 1 (first half of time), then RESTART with the second half
    spark.createDataFrame(ordered.iloc[:mid], schema=EVENTS_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)
    run()
    n_after_first = len(rows)
    spark.createDataFrame(ordered.iloc[mid:], schema=EVENTS_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)
    run()
    assert len(rows) > n_after_first > 0

    got = _norm(pd.DataFrame([r.asDict() for r in rows]))
    want = _norm(asof_attribute(events).toPandas())
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

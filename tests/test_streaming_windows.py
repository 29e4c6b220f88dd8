"""Watermarked window aggregation + stateful operator vs batch truth."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.streaming.windows import (
    hourly_rollup_stream,
    read_events_stream,
    running_user_totals,
)

SRC = "/root/testdata/sf0.001/events.parquet"


def _feed(spark, tmp_path, n_files=3):
    src = str(tmp_path / "src")
    ev = spark.read.parquet(SRC).orderBy("ts")
    total = ev.count()
    per = total // n_files
    pdf = ev.toPandas()
    for i in range(n_files):
        chunk = pdf.iloc[i * per : (i + 1) * per if i < n_files - 1 else total]
        spark.createDataFrame(chunk, schema=ev.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    return src, spark.read.parquet(src)


@pytest.mark.slow
def test_watermarked_hourly_rollup_matches_batch(spark, tmp_path):
    src, all_events = _feed(spark, tmp_path)
    q = (
        hourly_rollup_stream(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("rollup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from rollup").toPandas()
    assert len(got) > 0
    # batch truth for the same windows
    exp = (
        all_events.select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
        .groupBy(F.date_trunc("hour", "ts").alias("ws"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.avg("value") + 1e-9, 6).alias("avg_value"))
        .select(F.col("ws").cast("string").alias("window_start"), "event_type", "n_events", "avg_value")
        .toPandas()
    )
    m = got.merge(exp, on=["window_start", "event_type"], suffixes=("_s", "_b"))
    # every emitted (finalized) window must match batch exactly
    assert len(m) == len(got)
    assert (m["n_events_s"] == m["n_events_b"]).all()
    assert (abs(m["avg_value_s"] - m["avg_value_b"]) < 1e-9).all()
    # append mode must NOT emit windows the watermark hasn't passed:
    # the last 2h of event time stays open
    max_ts = pd.Timestamp(
        all_events.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    )
    emitted = pd.to_datetime(got["window_start"])
    assert (emitted + pd.Timedelta(hours=1) <= max_ts - pd.Timedelta(hours=2) + pd.Timedelta(hours=1)).all()


@pytest.mark.slow
def test_stateful_running_totals_match_batch(spark, tmp_path):
    src, all_events = _feed(spark, tmp_path)
    q = (
        running_user_totals(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "select user_id, max(n_events) n_events, max(sum_value) sum_value "
        "from totals group by user_id"
    ).toPandas().set_index("user_id").sort_index()
    exp = (
        all_events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (got.index == exp.index).all()
    assert (got["n_events"] == exp["n_events"]).all()
    assert (abs(got["sum_value"] - exp["sum_value"]) < 1e-6).all()

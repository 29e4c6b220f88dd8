"""Streaming dedup (first-seen semantics) must agree with a batch
recomputation over everything the stream has seen — across multiple
micro-batches and duplicate arrivals in later batches."""

import pandas as pd

from cuda_gis_smoothing_spark.streaming.dedup import (
    DOCS_SCHEMA,
    drop_exact_dups_stream,
    flag_exact_dups_stream,
    read_docs_stream,
)


def _docs(start, n, dup_every=3):
    rows = []
    for i in range(start, start + n):
        # every dup_every-th doc repeats an earlier text
        text = f"text {i % dup_every if i % dup_every == 0 else i}"
        if i % dup_every == 0:
            text = "repeated payload"
        rows.append((i, text, "en", "synth", len(text)))
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )


def _write(spark, src, start, n):
    spark.createDataFrame(_docs(start, n), schema=DOCS_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)


def _run_stream(spark, src, ckpt, transform, sink_table, mode):
    q = (
        transform(read_docs_stream(spark, src, max_files=1))
        .writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink_table)


def test_drop_exact_dups_stream_first_seen(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write(spark, src, 0, 30)
    _write(spark, src, 30, 30)
    got = _run_stream(
        spark, src, ckpt, drop_exact_dups_stream, "dedup_drop_sink", "append"
    ).toPandas()
    # one row per distinct text over BOTH batches
    all_docs = pd.concat([_docs(0, 30), _docs(30, 30)])
    assert len(got) == all_docs["text"].nunique()
    assert got["doc_id"].is_unique
    # the repeated payload survives exactly once
    assert (got["text"] == "repeated payload").sum() == 1


def _run_stream_foreach(spark, src, ckpt, transform):
    """Memory sink cannot recover from a checkpoint; foreachBatch can —
    this is the restart-safe harness (same pattern as IncrementalSmoother)."""
    rows = []

    def sink(df, _bid):
        rows.extend(df.collect())

    q = (
        transform(read_docs_stream(spark, src, max_files=1))
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return pd.DataFrame([r.asDict() for r in rows])


def test_flag_exact_dups_stream_attributes_canonicals(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write(spark, src, 0, 30)
    got1 = _run_stream_foreach(spark, src, ckpt, flag_exact_dups_stream)
    assert len(got1) == 30
    dups1 = got1[got1["is_duplicate"] == 1]
    # every duplicate points at the first-seen (smallest) id of its text
    assert (dups1["canonical_id"] == 0).all()  # "repeated payload" canon
    assert dups1["canonical_id"].lt(dups1["doc_id"]).all()

    # batch 2 arrives: stream restarts from checkpoint, state persists —
    # new repeats of old payloads attribute to the ORIGINAL canonical
    _write(spark, src, 30, 30)
    got2 = _run_stream_foreach(spark, src, ckpt, flag_exact_dups_stream)
    new = got2[got2["doc_id"] >= 30]
    assert len(new) == 30
    repeats = new[new["doc_id"] % 3 == 0]
    assert (repeats["canonical_id"] == 0).all()
    assert (repeats["is_duplicate"] == 1).all()
    # dup_seq keeps counting across batches for the shared digest
    assert repeats["dup_seq"].max() > 10


def test_flag_exact_dups_ttl_evicts_idle_digests(spark, tmp_path):
    """With a short processing-time TTL, a digest idle across batches
    is evicted: the same text arriving later starts a FRESH group
    (new canonical, dup_seq resets) instead of attributing to the
    long-gone original."""
    import time as _time

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")

    def run():
        rows = []

        def sink(df, _bid):
            rows.extend(df.collect())

        q = (
            flag_exact_dups_stream(
                read_docs_stream(spark, src, max_files=1), ttl_ms=1
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        # with ProcessingTimeTimeout the query keeps scheduling
        # timeout-service batches, so availableNow never self-terminates
        # — wait for the data batches, then stop explicitly
        import time as _t

        deadline = _t.time() + 60
        while _t.time() < deadline and not rows:
            _t.sleep(0.5)
        _t.sleep(3)  # drain any second data batch
        q.stop()
        q.awaitTermination(30)
        return pd.DataFrame([r.asDict() for r in rows])

    _write(spark, src, 0, 9)  # doc 0,3,6 share "repeated payload"
    got1 = run()
    assert got1[got1["doc_id"] == 6]["canonical_id"].iloc[0] == 0

    _time.sleep(2)  # let the 1 ms TTL lapse in processing time
    _write(spark, src, 30, 9)  # docs 30,33,36 repeat the same payload
    got2 = run()
    r36 = got2[got2["doc_id"] == 36].iloc[0]
    # state evicted between runs: 30 becomes the new canonical
    assert r36["canonical_id"] == 30
    assert got2[got2["doc_id"] == 30].iloc[0]["dup_seq"] == 1


def test_flag_exact_dups_eventtime_ttl_evicts_by_watermark(spark, tmp_path):
    """Event-time TTL: eviction is driven by DATA timestamps crossing
    the watermark — no sleeps anywhere. File k = micro-batch k:
      f1 (T0):      docs 0,3,6 share a payload  -> canonical 0
      f2 (T0+10m):  unrelated doc (advances the watermark past
                    T0 + ttl after the batch)
      f3 (T0+11m):  unrelated doc — the payload digest times out here
      f4 (T0+12m):  docs 30,33,36 repeat the payload -> FRESH group,
                    canonical 30, dup_seq restarts
    And batch-equality across a restart: stop after f2, restart from
    the checkpoint for f3+f4 — the combined output equals a fresh
    single run over all four files (replay evicts identically)."""
    import datetime as _dt

    from cuda_gis_smoothing_spark.streaming.dedup import (
        DOCS_TS_SCHEMA,
        flag_exact_dups_stream_eventtime,
    )

    T0 = _dt.datetime(2026, 1, 1, 0, 0, 0)

    def _write_ts(src, start, texts, minutes):
        ts = T0 + _dt.timedelta(minutes=minutes)
        rows = [
            (start + i, t, "en", "synth", len(t), ts)
            for i, t in enumerate(texts)
        ]
        spark.createDataFrame(rows, schema=DOCS_TS_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(src)

    def _run(src, ckpt):
        rows = []

        def sink(df, _bid):
            rows.extend(df.collect())

        stream = (
            spark.readStream.schema(DOCS_TS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            flag_exact_dups_stream_eventtime(stream, ttl_ms=60_000)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return pd.DataFrame([r.asDict() for r in rows])

    payload = ["repeated payload" if i % 3 == 0 else f"text {i}" for i in range(9)]
    src1, ckpt1 = str(tmp_path / "src1"), str(tmp_path / "ckpt1")
    _write_ts(src1, 0, payload, 0)
    _write_ts(src1, 20, ["solo a"], 10)
    got_a = _run(src1, ckpt1)  # restart point
    assert got_a[got_a["doc_id"] == 6]["canonical_id"].iloc[0] == 0
    _write_ts(src1, 21, ["solo b"], 11)
    _write_ts(src1, 30, payload, 12)
    got_b = _run(src1, ckpt1)  # resumes from checkpoint

    r36 = got_b[got_b["doc_id"] == 36].iloc[0]
    assert r36["canonical_id"] == 30  # evicted by watermark, fresh group
    assert got_b[got_b["doc_id"] == 30].iloc[0]["dup_seq"] == 1

    # fresh single run over the same four files: identical output
    src2, ckpt2 = str(tmp_path / "src2"), str(tmp_path / "ckpt2")
    _write_ts(src2, 0, payload, 0)
    _write_ts(src2, 20, ["solo a"], 10)
    _write_ts(src2, 21, ["solo b"], 11)
    _write_ts(src2, 30, payload, 12)
    got_f = _run(src2, ckpt2)
    key = ["doc_id", "canonical_id", "is_duplicate", "dup_seq"]
    combined = pd.concat([got_a, got_b])[key].sort_values(key).reset_index(drop=True)
    fresh = got_f[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(combined, fresh)

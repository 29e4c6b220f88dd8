"""Structured Streaming dedup: the streaming twins of the batch dedup
family (operators/dedup.py).

Batch dedup canonicalizes by MIN(doc_id) over the whole corpus; a
stream cannot know the global minimum, so streaming dedup is
FIRST-SEEN: the first document carrying a digest becomes canonical,
every later arrival is flagged (or dropped). Two implementations:

* :func:`drop_exact_dups_stream` — Spark's built-in streaming
  ``dropDuplicates`` on the digest: state = one row per distinct
  digest in the state store, exactly the built-in operator a user
  should reach for first.
* :func:`flag_exact_dups_stream` — ``applyInPandasWithState`` keeping
  (canonical_id, dup_count) per digest: emits EVERY doc with its
  canonical attribution instead of silently dropping — the shape a
  lineage-preserving pipeline needs (who was deduped against whom),
  not expressible with ``dropDuplicates``.

State sizing at 100 TB: one row per DISTINCT digest — bounded by
corpus cardinality, not stream length; shard count = shuffle
partitions on the digest key, uniformly distributed (md5). Add a
watermark + digest TTL when the dedup horizon is bounded in time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
#: the event-time variant reads streams carrying an event timestamp
DOCS_TS_SCHEMA = DOCS_SCHEMA + ", ts timestamp"


def require_utc_session(df: DataFrame, op: str) -> None:
    """The event-time TTL math compares pandas epoch values (Arrow
    localizes TimestampType to the SESSION timezone, then strips tz)
    against ``getCurrentWatermarkMs`` (true UTC epoch). Under any
    non-UTC session zone the two are offset and state evicts hours
    early/late — refuse loudly instead (session.py pins UTC)."""
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"{op} requires spark.sql.session.timeZone=UTC (got {tz!r}): "
            "its event-time deadlines mix session-localized pandas "
            "timestamps with the UTC watermark"
        )


def read_docs_stream(spark, source_dir: str, max_files: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(source_dir)
    )


def drop_exact_dups_stream(docs: DataFrame) -> DataFrame:
    """First-seen exact dedup via the built-in streaming state:
    emits each distinct text's first arrival, drops the rest."""
    return docs.withColumn("_k", F.md5("text")).dropDuplicates(["_k"]).drop("_k")


def minhash_neardup_stream(
    docs: DataFrame, n_hashes: int = 6, bands: int = 3, max_bucket: int = 256
) -> DataFrame:
    """Streaming MinHash-LSH near-dup detection — the stateful twin of
    the gated batch ``minhash_lsh_pairs``.

    Each arriving doc's band keys (same signatures/banding as the batch
    operator, all JVM-side before the stateful step) update per-bucket
    state = the doc ids seen in that (band, band_hash) bucket; the doc
    emits one candidate-pair row against every PRIOR member of the
    bucket. The union of emitted pairs over a time-ordered stream
    equals the batch operator's candidate pairs (deduped across bands —
    a pair sharing 2 bands is emitted by both buckets; distinct
    downstream, exactly like the batch groupBy counts shared bands).

    State at 100 TB: one id-list per DISTINCT bucket, capped at
    ``max_bucket`` members (a bucket that hot is a degenerate band —
    further members emit against the cap's worth of representatives and
    are NOT appended; log-scale corpora keep buckets tiny). Shuffle key
    is (band, bh) — the same key the batch join shuffles on.
    """
    from cuda_gis_smoothing_spark.operators.dedup import minhash_lsh_pairs  # noqa: F401 (semantics twin)

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        members = list(state.get[0]) if state.exists else []
        out = []
        # concat before sorting: a group split across Arrow chunks
        # arrives in shuffle order, and per-chunk sorting would make
        # the cap admission order replay-dependent
        chunks = list(pdfs)
        batch = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if not batch.empty:
            for doc_id in batch["doc_id"].sort_values():
                d = int(doc_id)
                for m in members:
                    a, b = (m, d) if m < d else (d, m)
                    if a != b:
                        out.append((a, b, key[0], key[1]))
                if len(members) < max_bucket and d not in members:
                    members.append(d)
        state.update((members,))
        yield pd.DataFrame(out, columns=["doc_a", "doc_b", "band", "bh"])

    banded = _banded_keys(docs, n_hashes=n_hashes, bands=bands)
    return banded.groupBy("band", "bh").applyInPandasWithState(
        fn,
        outputStructType="doc_a long, doc_b long, band int, bh long",
        stateStructType="members array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _banded_keys(docs: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    """(doc_id, band, bh) band keys with the EXACT batch arithmetic
    (operators/dedup.py::minhash_lsh_pairs banding over
    minhash_signatures) — but computed as a PURE PROJECTION: the batch
    operator's explode → groupBy(min) is a streaming AGGREGATION, and
    Spark forbids an aggregation upstream of applyInPandasWithState in
    one query. Shared with the batch blocked bucket verify as
    operators/dedup.py::banded_keys_projection; equality with the batch
    signatures is asserted in tests."""
    from cuda_gis_smoothing_spark.operators.dedup import banded_keys_projection

    return banded_keys_projection(docs, n_hashes, bands)


def minhash_neardup_stream_eventtime(
    docs: DataFrame,
    ttl_ms: int,
    n_hashes: int = 6,
    bands: int = 3,
    max_bucket: int = 256,
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """:func:`minhash_neardup_stream` with an EVENT-TIME dedup horizon:
    a bucket member whose last-seen event time has fallen more than
    ``ttl_ms`` behind the watermark stops generating candidate pairs
    (it is pruned from the bucket state before pairing), and a bucket
    idle past the horizon is removed entirely via EventTimeTimeout.
    State per bucket becomes "members seen within a TTL window"
    instead of all members ever — bounded for unbounded streams, and
    replay/backfill prune identically to the live run (the horizon is
    data-driven, not wall-clock). Arrival order within a batch is
    (event time, doc_id) — deterministic under replay."""
    require_utc_session(docs, "minhash_neardup_stream_eventtime")

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            members, last = list(state.get[0]), list(state.get[1])
        else:
            members, last = [], []
        wm = state.getCurrentWatermarkMs()
        keep = [i for i in range(len(members)) if last[i] + ttl_ms > wm]
        members = [members[i] for i in keep]
        last = [last[i] for i in keep]
        out = []
        chunks = list(pdfs)
        batch = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if not batch.empty:
            for r in batch.sort_values([ts_col, "doc_id"]).itertuples(index=False):
                d = int(r.doc_id)
                ms = int(getattr(r, ts_col).value // 1_000_000)
                for m in members:
                    a, b = (m, d) if m < d else (d, m)
                    if a != b:
                        out.append((a, b, key[0], key[1]))
                if d in members:
                    last[members.index(d)] = max(last[members.index(d)], ms)
                elif len(members) < max_bucket:
                    members.append(d)
                    last.append(ms)
        state.update((members, last))
        state.setTimeoutTimestamp(max(max(last, default=0) + ttl_ms, wm + 1))
        yield pd.DataFrame(out, columns=["doc_a", "doc_b", "band", "bh"])

    # the watermark column must survive the projection down to the
    # stateful operator: _banded_keys_with carries ts alongside the keys
    banded = _banded_keys_with(
        docs.withWatermark(ts_col, watermark_delay), n_hashes, bands, ts_col
    )
    return banded.groupBy("band", "bh").applyInPandasWithState(
        fn,
        outputStructType="doc_a long, doc_b long, band int, bh long",
        stateStructType="members array<long>, last_ms array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _banded_keys_with(
    docs: DataFrame, n_hashes: int, bands: int, ts_col: str
) -> DataFrame:
    """(doc_id, band, bh, ts) band keys carrying the event-time column
    (the watermark column must reach the stateful operator)."""
    from cuda_gis_smoothing_spark.operators.dedup import banded_keys_projection

    return banded_keys_projection(
        docs, n_hashes, bands, extra={ts_col: F.col(ts_col)}
    )


def flag_exact_dups_stream(docs: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """First-seen exact dedup that KEEPS the duplicates, attributed:
    emits (doc_id, canonical_id, is_duplicate, dup_seq) for every doc,
    where canonical_id is the first-seen doc of the digest and dup_seq
    counts arrivals so far (1 = the canonical itself). Per-digest state
    is a (canonical_id, count) pair in GroupState.

    ``ttl_ms`` bounds state for unbounded streams: a digest idle longer
    than the TTL is evicted (processing-time timeout), so a later
    identical doc starts a fresh group — the dedup horizon becomes the
    TTL instead of stream lifetime, and state size becomes "digests
    seen within a TTL window" instead of all digests ever."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            canonical, seen = state.get
        else:
            canonical, seen = None, 0
        out = []
        # arrival order within a batch is made deterministic by doc_id
        # ACROSS chunks (a group split over Arrow batches arrives in
        # shuffle order) so replays attribute identically
        chunks = list(pdfs)
        batch = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if not batch.empty:
            for doc_id in batch["doc_id"].sort_values():
                seen += 1
                if canonical is None:
                    canonical = int(doc_id)
                out.append((int(doc_id), canonical, int(doc_id != canonical), seen))
        state.update((canonical, seen))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            out, columns=["doc_id", "canonical_id", "is_duplicate", "dup_seq"]
        )

    return (
        docs.select(F.md5("text").alias("_k"), "doc_id")
        .groupBy("_k")
        .applyInPandasWithState(
            fn,
            outputStructType=(
                "doc_id long, canonical_id long, is_duplicate int, dup_seq long"
            ),
            stateStructType="canonical long, seen long",
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if ttl_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def flag_exact_dups_stream_eventtime(
    docs: DataFrame,
    ttl_ms: int,
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """EVENT-TIME TTL twin of :func:`flag_exact_dups_stream`: the dedup
    horizon is measured against the stream's WATERMARK, not wall-clock
    — a digest whose newest event time is more than ``ttl_ms`` behind
    the watermark is evicted, and a later identical doc starts a fresh
    group. Replays and backfills therefore evict IDENTICALLY to the
    live run (the processing-time variant's lifetime depends on batch
    spacing: a fast replay of a slow day keeps state a slow day would
    have dropped, and vice versa) — batch-equality across a restart is
    pytest-gated.

    Semantics detail (inherent to Spark's state timeouts): a timeout
    only fires for a group with NO data in the triggering batch, so a
    duplicate arriving in the very batch whose watermark first passes
    the group's deadline still attributes to the old canonical — the
    horizon is "evicted once the watermark passes last_event + ttl
    BEFORE the next arrival", exactly the watermark contract streaming
    aggregations give late data. Attribution order within a batch is
    (event time, doc_id) — deterministic under replay. Late rows whose
    deadline would precede the current watermark keep the group alive
    one extra tick (the timeout timestamp is clamped above the
    watermark, which Spark requires).
    """
    require_utc_session(docs, "flag_exact_dups_stream_eventtime")

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            canonical, seen, last_ms = state.get
        else:
            canonical, seen, last_ms = None, 0, 0
        out = []
        chunks = list(pdfs)
        batch = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if not batch.empty:
            for r in batch.sort_values([ts_col, "doc_id"]).itertuples(index=False):
                seen += 1
                if canonical is None:
                    canonical = int(r.doc_id)
                out.append(
                    (int(r.doc_id), canonical, int(r.doc_id != canonical), seen)
                )
                last_ms = max(last_ms, int(getattr(r, ts_col).value // 1_000_000))
        state.update((canonical, seen, last_ms))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_ms + ttl_ms, wm + 1))
        yield pd.DataFrame(
            out, columns=["doc_id", "canonical_id", "is_duplicate", "dup_seq"]
        )

    return (
        docs.withWatermark(ts_col, watermark_delay)
        .select(F.md5("text").alias("_k"), "doc_id", ts_col)
        .groupBy("_k")
        .applyInPandasWithState(
            fn,
            outputStructType=(
                "doc_id long, canonical_id long, is_duplicate int, dup_seq long"
            ),
            stateStructType="canonical long, seen long, last_ms long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

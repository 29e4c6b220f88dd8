"""Maintained bigram/co-occurrence statistics (CLAUDE.md r6 backlog:
"the dfreq-log pattern applies directly").

``functions/text.bigram_pmi`` is a batch rebuild: every run re-explodes
the corpus into bigram and unigram occurrences and re-aggregates their
corpus-wide counts. At 100 TB the collocation statistics a phrase-mining
/ embedding pipeline consumes are a MAINTAINED table — this module is
that maintained form, the exact layout ``MaintainedPostings`` uses for
its dfreq/stats logs (streaming/retrieval.py:41-59), applied to
co-occurrence counts:

* ``doc_grams`` — ONE doc-keyed row per document:
  ``(doc_id, _big array<struct<t1,t2,_n>>, _uni array<struct<t,_n>>,
  _nb, _nt)`` — the doc's bigram- and unigram-count slices plus its
  totals, derived by the SAME ``split(lower(text), ' ')`` tokenizer and
  empty-token filters as the batch operator. A doc whose text yields no
  tokens (NULL text, empty string) gets EMPTY slices — the tombstone is
  the natural empty row here, no special-casing (unlike the postings
  log, where zero exploded rows required an explicit tombstone,
  ADVICE r4).
* ``bigrams`` — (t1, t2)-keyed ABSOLUTE counts, latest-wins. A batch
  diffs its doc ids' PRIOR slices (key semi-join against state, read
  with ``before_batch_id`` so a crash replay never sees its own partial
  delta) against the new slices into net per-bigram deltas, joins the
  touched bigrams against the current count table, and writes absolute
  rows — delta size O(batch bigram vocabulary), never O(corpus)
  (tested). The composite key is a SnapshotLog key LIST — no
  concat-key ambiguity for tokens containing separator bytes.
* ``unigrams`` — token-keyed absolute counts, same maintenance.
* ``stats`` — one row ``(n_tokens, n_bigrams)``: the corpus totals T
  and B, decrement+increment-maintained from the per-doc ``_nt``/``_nb``
  sums. Counts are integers in longs, so the maintained totals equal a
  batch rebuild's ``SUM`` exactly and the served PMI doubles are
  bit-identical to ``bigram_pmi`` (tested multi-batch and through doc
  updates; the ``bigram_pmi_maintained`` driver gate routes the corpus
  through a single-batch instance against the identical SQL twin).

Crash contract (the three-log precedent, packer/retrieval): the replay
guard is ``has(batch_id)`` on the STATS log, written LAST; doc_grams,
bigrams, and unigrams deltas overwrite idempotently on replay, and
every prior-state read inside the batch uses ``before_batch_id``.

Reference parity note: the reference engine (CUDA grid smoothing) has
no retrieval/corpus layer; this extends the graft's LLM-data-pipeline
surface (SURVEY.md §2 additions), pairing with bigram_pmi the way
MaintainedPostings pairs with bm25_search.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog

_BIG_EMPTY = "CAST(array() AS array<struct<t1:string,t2:string,_n:bigint>>)"
_UNI_EMPTY = "CAST(array() AS array<struct<t:string,_n:bigint>>)"


def _doc_gram_slices(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 1,
) -> DataFrame:
    """One row per distinct batch doc id: the doc's pair/unigram count
    slices and totals, by the batch operator's tokenizer
    (``split(lower(text), ' ')``; empty tokens excluded at both levels,
    pairs only where BOTH sides are non-empty —
    functions/text.py:257-271). ``window=1`` is adjacent bigrams (the
    bigram_pmi contract); ``window>1`` is the windowed co-occurrence
    pair derivation (the SHARED ``window_pairs_expr`` text — one
    definition with the batch operator)."""
    from cuda_gis_smoothing_spark.functions.text import window_pairs_expr

    toks = F.split(F.lower(F.col(text_col)), " ")
    d = docs.select(F.col(id_col), toks.alias("_t"))
    uni = (
        d.select(id_col, F.explode("_t").alias("t"))
        .where(F.col("t") != "")
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("t", "_n")).alias("_uni"),
            F.sum("_n").alias("_nt"),
        )
    )
    big = (
        d.select(
            id_col,
            F.explode(F.expr(window_pairs_expr(window))).alias("_b"),
        )
        .select(id_col, "_b.t1", "_b.t2")
        .where((F.col("t1") != "") & (F.col("t2") != ""))
        .groupBy(id_col, "t1", "t2")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("t1", "t2", "_n")).alias("_big"),
            F.sum("_n").alias("_nb"),
        )
    )
    return (
        docs.select(id_col)
        .distinct()
        .join(big, id_col, "left")
        .join(uni, id_col, "left")
        .select(
            id_col,
            F.coalesce("_big", F.expr(_BIG_EMPTY)).alias("_big"),
            F.coalesce("_uni", F.expr(_UNI_EMPTY)).alias("_uni"),
            F.coalesce("_nb", F.lit(0)).cast("long").alias("_nb"),
            F.coalesce("_nt", F.lit(0)).cast("long").alias("_nt"),
        )
    )


class MaintainedBigrams:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        id_col: str = "doc_id",
        compact_every: int = 4,
        window: int = 1,
    ):
        """``window=1`` maintains adjacent-bigram statistics (the
        bigram_pmi pairing); ``window>1`` maintains WINDOWED
        co-occurrence pair counts (the cooccurrence_window pairing —
        served by :meth:`cooccurrence`; :meth:`bigram_pmi` is
        adjacent-only and raises). The log layouts are identical —
        only the per-doc pair derivation widens."""
        self.spark = spark
        self.id_col = id_col
        self.compact_every = compact_every
        self.window = int(window)
        self.log = SnapshotLog(
            spark, os.path.join(state_root, "doc_grams"), key=id_col
        )
        self.big_log = SnapshotLog(
            spark, os.path.join(state_root, "bigrams"), key=["t1", "t2"]
        )
        self.uni_log = SnapshotLog(
            spark, os.path.join(state_root, "unigrams"), key="t"
        )
        self.stats_log = SnapshotLog(
            spark, os.path.join(state_root, "stats"), key="k"
        )

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        """Fold a batch of (re)ingested docs into the statistics: one
        doc-keyed slice delta of O(batch) rows, bigram/unigram count
        deltas of O(batch vocabulary) rows, one 1-row stats delta."""
        if self.stats_log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        # write the doc-slice delta FIRST, read it back (read_delta: the
        # parquet IS the materialization the diffs below consume)
        self.log.write_delta(
            _doc_gram_slices(docs, id_col=self.id_col, window=self.window),
            batch_id,
        )
        delta = self.log.read_delta(batch_id)
        prior = self.log.read(before_batch_id=batch_id)
        old_rows = (
            None
            if prior is None
            else prior.join(
                delta.select(self.id_col), self.id_col, "left_semi"
            ).localCheckpoint()  # feeds bigram, unigram AND stats decrements
        )

        def _net(col: str, fields: list[str]) -> DataFrame:
            def contrib(rows: DataFrame, sign: int) -> DataFrame:
                return rows.select(F.explode(col).alias("_p")).select(
                    *[F.col(f"_p.{f}").alias(f) for f in fields],
                    (F.col("_p._n") * sign).alias("_d"),
                )

            c = contrib(delta, 1)
            if old_rows is not None:
                c = c.unionByName(contrib(old_rows, -1))
            return (
                c.groupBy(*fields)
                .agg(F.sum("_d").alias("_net"))
                .where(F.col("_net") != 0)
            )

        def _absolute(net: DataFrame, log: SnapshotLog, fields: list[str]) -> DataFrame:
            cur = log.read(before_batch_id=batch_id)
            if cur is None:
                return net.select(
                    *fields, F.col("_net").cast("long").alias("cnt")
                )
            return net.join(cur, fields, "left").select(
                *fields,
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.col("_net"))
                .cast("long")
                .alias("cnt"),
            )

        new_big = _absolute(_net("_big", ["t1", "t2"]), self.big_log, ["t1", "t2"])
        new_uni = _absolute(_net("_uni", ["t"]), self.uni_log, ["t"])

        def _totals(rows: DataFrame) -> tuple[int, int]:
            r = rows.agg(
                F.sum("_nt").alias("t"), F.sum("_nb").alias("b")
            ).collect()[0]
            return int(r["t"] or 0), int(r["b"] or 0)

        def _stats_inputs() -> tuple[int, int]:
            add_t, add_b = _totals(delta)
            rm_t, rm_b = (0, 0) if old_rows is None else _totals(old_rows)
            old_stats = self.stats_log.read(before_batch_id=batch_id)
            if old_stats is None:
                base_t, base_b = 0, 0
            else:
                row = old_stats.collect()[0]
                base_t, base_b = int(row["n_tokens"]), int(row["n_bigrams"])
            return base_t - rm_t + add_t, base_b - rm_b + add_b

        # write order is the crash contract: doc_grams (above), the two
        # count logs, then the stats row LAST as the replay guard. The
        # two count writes and the stats-input aggregates are
        # independent reads of the materialized delta — overlap them
        # from a driver thread pool (guide §2.6; their RELATIVE order
        # was never part of the contract, only stats-last is) — the
        # stats write still happens after all three complete.
        with ThreadPoolExecutor(max_workers=3) as pool:
            big_f = pool.submit(self.big_log.write_delta, new_big, batch_id)
            uni_f = pool.submit(self.uni_log.write_delta, new_uni, batch_id)
            stats_f = pool.submit(_stats_inputs)
            big_f.result()
            uni_f.result()
            n_tokens, n_bigrams = stats_f.result()
        self.stats_log.write_delta(
            self.spark.createDataFrame(
                [("total", n_tokens, n_bigrams)],
                "k string, n_tokens long, n_bigrams long",
            ),
            batch_id,
        )
        if self.log.delta_count() >= self.compact_every:
            for log in (self.log, self.big_log, self.uni_log, self.stats_log):
                log.compact(batch_id)

    def stats_row(self) -> tuple[int, int] | None:
        """(T total tokens, B total bigrams) from the 1-row stats log."""
        t = self.stats_log.read()
        if t is None:
            return None
        r = t.collect()[0]
        return int(r["n_tokens"]), int(r["n_bigrams"])

    def bigram_counts(self) -> DataFrame | None:
        """The maintained (t1, t2, cnt) table — cnt = 0 rows (a bigram
        whose last doc left the corpus) filtered out."""
        t = self.big_log.read()
        if t is None:
            return None
        return t.where(F.col("cnt") > 0)

    def unigram_counts(self) -> DataFrame | None:
        t = self.uni_log.read()
        if t is None:
            return None
        return t.where(F.col("cnt") > 0)

    def bigram_pmi(self, k: int = 30) -> DataFrame:
        """Top-``k`` bigrams with PMI over the CURRENT state — the
        maintained form of ``functions/text.bigram_pmi``: counts from
        the maintained tables, totals from the 1-row stats log, NOTHING
        re-tokenized or re-aggregated over the corpus at read time.
        Same (count desc, t1, t2) total order, same ln formula over the
        same exact-integer totals, same round6 — bit-identical to the
        batch operator (tested; gated as ``bigram_pmi_maintained``).
        Reads state through EAGER localCheckpoints — the
        MaintainedPostings.search contract: callers may delete the
        state directory once the plan is built."""
        from cuda_gis_smoothing_spark.functions.numeric import round6

        if self.window != 1:
            raise ValueError(
                "bigram_pmi is adjacent-bigram-only (window=1); this "
                "instance maintains windowed co-occurrence counts"
            )
        bc = self.bigram_counts()
        uni = self.unigram_counts()
        st = self.stats_row()
        if bc is None or uni is None or st is None or st[1] == 0:
            raise ValueError(
                "MaintainedBigrams: empty state (no batches applied or no bigrams)"
            )
        t_tot, b_tot = float(st[0]), float(st[1])
        bc = bc.localCheckpoint(eager=True)
        uni = uni.localCheckpoint(eager=True)
        top = bc.orderBy(F.col("cnt").desc(), "t1", "t2").limit(k)
        w = Window.orderBy(F.col("cnt").desc(), "t1", "t2")
        pmi = F.log(
            (F.col("cnt") / F.lit(b_tot))
            / ((F.col("_u1") / F.lit(t_tot)) * (F.col("_u2") / F.lit(t_tot)))
        )
        return (
            top.withColumn("rank", F.row_number().over(w))
            .join(uni.select(F.col("t").alias("t1"), F.col("cnt").alias("_u1")), "t1")
            .join(uni.select(F.col("t").alias("t2"), F.col("cnt").alias("_u2")), "t2")
            .select(
                "t1",
                "t2",
                F.col("cnt").cast("long").alias("n_pairs"),
                round6(pmi).alias("pmi"),
                "rank",
            )
        )

    def cooccurrence(self, k: int = 30) -> DataFrame:
        """Top-``k`` windowed co-occurrence pairs over the CURRENT
        state — the maintained form of
        ``functions/text.cooccurrence_window``: counts from the
        maintained pair table, NOTHING re-tokenized at read time; the
        SAME (count desc, t1, t2) total order over the same exact
        integers ⇒ bit-identical to the batch operator (tested; gated
        as ``cooccurrence_window_maintained``). State read through an
        EAGER localCheckpoint (the search contract)."""
        bc = self.bigram_counts()
        if bc is None:
            raise ValueError("MaintainedBigrams: empty state")
        bc = bc.localCheckpoint(eager=True)
        w = Window.orderBy(F.col("cnt").desc(), "t1", "t2")
        return (
            bc.orderBy(F.col("cnt").desc(), "t1", "t2")
            .limit(int(k))
            .withColumn("rank", F.row_number().over(w))
            .select(
                "t1",
                "t2",
                F.col("cnt").cast("long").alias("n_pairs"),
                F.col("rank").cast("int").alias("rank"),
            )
        )

    def textrank(self, k: int = 30, damping: float = 0.85, iters: int = 5) -> DataFrame:
        """TextRank keywords over the CURRENT state — the maintained
        form of ``functions/text.keyword_textrank``: the DISTINCT
        co-occurrence graph is recovered from the maintained pair
        table (canonical pair keys with cnt > 0 — the same set the
        batch operator's distinct produces) and vertices from the
        unigram table, then the shared fixed-iteration
        ``pagerank_rounds`` core runs over state at read time —
        recompute-from-state-on-read (the flow-router closure
        precedent): nothing re-tokenizes the corpus; the graph is
        O(vocabulary), not O(corpus). Same round6-rank total-order
        k-cut ⇒ equal to the batch operator (tested; gated as
        ``keyword_textrank_maintained``, SHARED twin)."""
        from cuda_gis_smoothing_spark.operators.stats import pagerank_rounds

        bc = self.bigram_counts()
        uni = self.unigram_counts()
        if bc is None or uni is None:
            raise ValueError("MaintainedBigrams: empty state")
        und = (
            bc.where(F.col("t1") != F.col("t2"))
            .select(
                F.least("t1", "t2").alias("a"), F.greatest("t1", "t2").alias("b")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        edges = und.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                    F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
                )
            ).alias("_e")
        ).select("_e.src", "_e.dst")
        nodes = uni.select(F.col("t").alias("token")).localCheckpoint(eager=True)
        pr = pagerank_rounds(nodes, edges, damping, iters, id_col="token")
        w = Window.orderBy(F.col("pagerank").desc(), "token")
        return (
            pr.orderBy(F.col("pagerank").desc(), "token")
            .limit(int(k))
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .select("token", "pagerank", "rank")
        )

    def start(self, source_dir: str, checkpoint_dir: str, available_now: bool = True):
        from cuda_gis_smoothing_spark.streaming.dedup import DOCS_SCHEMA

        stream = (
            self.spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(source_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

"""Maintained incremental PQ codes — the quantization twin of
streaming/similarity.MaintainedIVF: embeddings arrive continuously and
the compressed (PQ) vector layout must extend per batch without
re-encoding the corpus.

State shape: ONE vec-keyed SnapshotLog row per vector —
``(vec_id, codes array<int>)``, the codes ordered by subspace — derived
by the SAME argmin arithmetic as ``operators/quantization.pq_encode``
(via ``pq_encode_against``), against a codebook FROZEN at construction
(the standard PQ contract, same as MaintainedIVF's frozen coarse
quantizer: retraining the codebook invalidates every stored code — a
rebuild, not an update):

* a batch writes O(batch vectors) rows, never O(corpus) (tested);
* a re-ingested vec_id REPLACES its codes via latest-wins — vector
  update is one delta row (tested against a batch re-encode);
* a NULL-embedding row writes an EMPTY codes array — an explicit
  tombstone, so latest-wins REMOVES the vector from the served index
  (the MaintainedPostings NULL-text lesson, ADVICE r4: zero exploded
  rows silently keep stale state; an empty-array row replaces it);
* crash replay is the standard single-log contract: one write per
  batch, ``has(batch_id)`` short-circuits, the delta overwrite is
  idempotent.

Query path: ADC over reconstructions of the STORED codes
(``pq_reconstruct_against`` + the pq_search rank) — the original
floats are never read at query time, which is the point of PQ: the
serving tier holds m ints per vector. Single-batch equality with the
batch operators is driver-gated (``pq_codes_maintained`` shares
pq_codes' DuckDB twin); multi-batch and update equality are pytest
(tests/test_streaming_quantization.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cuda_gis_smoothing_spark.operators.quantization import (
    codebook_from_seeds,
    pq_encode_against,
    pq_reconstruct_against,
)
from cuda_gis_smoothing_spark.operators.similarity import dot_col
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog

_CODES_EMPTY = "CAST(array() AS array<int>)"


class MaintainedPQ:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        codebook,
        m: int = 8,
        id_col: str = "vec_id",
        compact_every: int = 4,
    ):
        """``codebook``: (ksub, dim) float64 array of FULL seed
        vectors, raw (unnormalized — the pq_encode convention); sliced
        into the (cid, s, sub) table once here."""
        import numpy as np

        self.spark = spark
        self.m = m
        self.id_col = id_col
        self.compact_every = compact_every
        self.codebook = np.asarray(codebook, dtype=np.float64)
        seeds = spark.createDataFrame(
            [(cid, [float(x) for x in row]) for cid, row in enumerate(self.codebook)],
            "cid int, _e array<double>",
        )
        # materialize the tiny sliced table once; every batch and every
        # query broadcasts it ('build once, encode many')
        self._cents = codebook_from_seeds(seeds, m).localCheckpoint(eager=True)
        self.log = SnapshotLog(spark, os.path.join(state_root, "codes"), key=id_col)

    @classmethod
    def seeded(
        cls,
        spark: SparkSession,
        state_root: str,
        embeddings: DataFrame,
        m: int = 8,
        ksub: int = 16,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        compact_every: int = 4,
    ) -> "MaintainedPQ":
        """Freeze the pq_encode seeded codebook (the ``ksub``
        smallest-id vectors of ``embeddings``, exact doubles collected
        once) — the gate path: single-batch state then equals
        ``pq_codes`` bit-for-bit."""
        import numpy as np

        rows = (
            embeddings.orderBy(id_col)
            .limit(ksub)
            .select(F.col(emb_col).cast("array<double>"))
            .collect()
        )
        return cls(
            spark,
            state_root,
            np.asarray([r[0] for r in rows], dtype=np.float64),
            m=m,
            id_col=id_col,
            compact_every=compact_every,
        )

    def process_batch(self, embeddings: DataFrame, batch_id: int) -> None:
        """Encode a batch of (re)ingested vectors against the frozen
        codebook: one vec-keyed delta of O(batch) rows, NULL-embedding
        rows as empty-array tombstones."""
        if self.log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        codes = (
            pq_encode_against(embeddings, self.codebook, self.m, self.id_col)
            .groupBy(self.id_col)
            .agg(
                F.expr("transform(sort_array(collect_list(struct(subspace, code))), x -> x.code)").alias(
                    "codes"
                )
            )
        )
        rows = (
            embeddings.select(self.id_col)
            .distinct()
            .join(codes, self.id_col, "left")
            .select(
                self.id_col,
                F.coalesce("codes", F.expr(_CODES_EMPTY)).alias("codes"),
            )
        )
        self.log.write_delta(rows, batch_id)
        if self.log.delta_count() >= self.compact_every:
            self.log.compact(batch_id)

    def codes(self) -> DataFrame:
        """The served (vec_id, subspace, code) table — pq_codes-shaped;
        tombstoned (empty-codes) vectors excluded. Reads state through
        an EAGER localCheckpoint (the MaintainedIVF.query contract:
        callers may delete the state directory once the plan is
        built)."""
        t = self.log.read()
        if t is None:
            raise ValueError("MaintainedPQ: empty state (no batches applied)")
        t = t.where(F.size("codes") > 0).localCheckpoint(eager=True)
        return t.select(
            self.id_col, F.posexplode("codes").alias("subspace", "code")
        ).select(
            self.id_col,
            F.col("subspace").cast("int").alias("subspace"),
            F.col("code").cast("int").alias("code"),
        )

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        query_id_col: str = "query_id",
        emb_col: str = "embedding",
    ) -> DataFrame:
        """ADC top-k over the STORED codes — identical arithmetic and
        output shape to ``operators/quantization.pq_search`` (same
        q·q + r·r − 2·q·r composition, same (dist, id) total order);
        over a single-batch state the results are equal bit-for-bit
        (tested). The corpus floats are never touched."""
        from cuda_gis_smoothing_spark.functions.numeric import round6

        recon = pq_reconstruct_against(self.codes(), self._cents, self.id_col).select(
            F.col(self.id_col).alias("neighbor_id"),
            "recon",
            dot_col("recon", "recon").alias("_rr"),
        )
        q = queries.select(
            query_id_col, F.col(emb_col).cast("array<double>").alias("_q")
        ).withColumn("_qq", dot_col("_q", "_q"))
        pairs = recon.join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col))
        dist = (
            F.col("_qq") + F.col("_rr") - F.lit(2.0) * dot_col("_q", "recon")
        ).alias("_d")
        ranked = pairs.select(query_id_col, "neighbor_id", dist).withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.col("_d").asc(), F.col("neighbor_id").asc()
                )
            ),
        )
        return ranked.where(F.col("rank") <= k).select(
            query_id_col,
            "neighbor_id",
            round6(F.col("_d")).alias("adc_dist"),
            F.col("rank").cast("int").alias("rank"),
        )

    def start(self, source_dir: str, checkpoint_dir: str, available_now: bool = True):
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField(self.id_col, T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        )
        stream = (
            self.spark.readStream.schema(schema)
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


def export_ivfpq(ivf, pq: MaintainedPQ, path: str):
    """Compose the two maintained ingest logs — ``MaintainedIVF``
    bucket assignments and ``MaintainedPQ`` codes — into ONE
    bucket-partitioned ``operators.quantization.IVFPQIndex`` serving
    layout (the IVFPQ analog of ``MaintainedIVF.export_index``): the
    vec-keyed logs absorb O(batch) ingest, the export is a periodic
    one-pass compaction that recovers true partition pruning AND
    code-only candidate rows.

    Inner join on vec_id: a vector is servable only when BOTH tiers
    hold its latest row — the caller feeds both logs the same batches
    in lockstep (the two-tier deployment contract). PQ empty-codes
    tombstones drop via the size filter, so a vector NULLed in a later
    batch vanishes from the export; a vector updated in both tiers
    serves its latest bucket AND latest codes (tested)."""
    from cuda_gis_smoothing_spark.operators.quantization import IVFPQIndex

    iv = ivf.corpus()
    if iv is None:
        raise ValueError("export_ivfpq: empty IVF log (no batches applied)")
    codes = pq.log.read()
    if codes is None:
        raise ValueError("export_ivfpq: empty PQ log (no batches applied)")
    corpus = iv.select(F.col(ivf.id_col).alias("vec_id"), "bucket").join(
        codes.where(F.size("codes") > 0).select(
            F.col(pq.id_col).alias("vec_id"), "codes"
        ),
        "vec_id",
    )
    return IVFPQIndex._write(
        ivf.spark, corpus, path, ivf.centroids, pq.codebook, pq.m
    )

"""Maintained co-purchase statistics — the streaming form of the
item-item CF count tables behind ``operators/analytics.part_similarity``.

Orders are APPEND-ONLY and arrive WHOLE (an order's lineitems land in
one batch — the events-immutability contract applied to baskets;
re-ingesting a seen order key RAISES, the MaintainedComponents
append-only precedent, because a split order would silently lose its
cross-batch intra-order pairs):

* ``pairs``  — (part_a < part_b)-keyed ABSOLUTE co-order counts,
  latest-wins: a batch's own pair aggregate (the SHARED
  ``_copurchase_pairs`` fold at min_support=1 — support is a SERVE-time
  filter here, state must count every pair so later batches can lift a
  pair over the support line) joins its touched keys against prior
  state (``before_batch_id``) and writes absolute rows. O(batch pair
  keys) delta rows (tested).
* ``parts``  — part-keyed absolute membership counts, same maintenance.
* ``orders`` — one row per seen order key: the append-only guard AND
  the replay guard (written LAST; ``has(batch_id)`` short-circuits a
  replayed batch before any read or write).

Serving routes through the shared ``part_sim_from_counts`` kernel, so
the maintained neighbor lists are bit-identical to the batch operator
over the same orders (tested multi-batch; the driver gates the path via
``part_similarity_maintained`` — single-batch instance == batch
exactly, SHARED twin, the smooth_maintained precedent).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession, functions as F

from cuda_gis_smoothing_spark.operators.analytics import (
    BASKET_MIN_SUPPORT,
    PART_REC_TOPK,
    PART_SIM_TOPK,
    _copurchase_pairs,
    part_sim_from_counts,
    recommend_from_sim,
)
from cuda_gis_smoothing_spark.streaming.incremental import SnapshotLog


class MaintainedCopurchase:
    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        compact_every: int = 4,
    ):
        self.spark = spark
        self.compact_every = compact_every
        self.pairs_log = SnapshotLog(
            spark, os.path.join(state_root, "pairs"), key=["part_a", "part_b"]
        )
        self.parts_log = SnapshotLog(
            spark, os.path.join(state_root, "parts"), key="l_partkey"
        )
        self.orders_log = SnapshotLog(
            spark, os.path.join(state_root, "orders"), key="l_orderkey"
        )

    # ------------------------------------------------------------------
    def process_batch(self, lineitem: DataFrame, batch_id: int) -> None:
        """Fold one batch of WHOLE orders into the pair/part counts:
        O(batch pair keys) absolute delta rows per log."""
        if self.orders_log.has(batch_id):
            return  # crash replay of an applied batch: no-op
        op = (
            lineitem.select("l_orderkey", "l_partkey")
            .distinct()
            .localCheckpoint()  # pair self-join + part counts + guard
        )
        seen = self.orders_log.read(before_batch_id=batch_id)
        if seen is not None:
            dup = (
                op.select("l_orderkey")
                .distinct()
                .join(seen, "l_orderkey", "left_semi")
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    "MaintainedCopurchase is append-only over WHOLE "
                    f"orders; order {dup[0].l_orderkey} was already "
                    "ingested (a split order would lose cross-batch "
                    "intra-order pairs)"
                )
        # state counts EVERY pair (min_support=1): the serve-time
        # support filter must see pairs that cross the line later
        add_pairs = _copurchase_pairs(op, 1).select(
            "part_a", "part_b", F.col("n_both").alias("_d")
        )
        add_parts = op.groupBy("l_partkey").agg(
            F.count(F.lit(1)).cast("long").alias("_d")
        )

        def _absolute(
            add: DataFrame, log: SnapshotLog, keys: list[str], cnt: str
        ) -> DataFrame:
            cur = log.read(before_batch_id=batch_id)
            if cur is None:
                return add.select(
                    *keys, F.col("_d").cast("long").alias(cnt)
                )
            return add.join(cur, keys, "left").select(
                *keys,
                (F.coalesce(F.col(cnt), F.lit(0)) + F.col("_d"))
                .cast("long")
                .alias(cnt),
            )

        # the two count-log writes are independent reads of the
        # checkpointed op table — overlap them (guide §2.6, the
        # MaintainedBigrams pattern); the order-membership guard below
        # still writes LAST.
        with ThreadPoolExecutor(max_workers=2) as pool:
            pairs_f = pool.submit(
                self.pairs_log.write_delta,
                _absolute(
                    add_pairs, self.pairs_log, ["part_a", "part_b"], "n_both"
                ),
                batch_id,
            )
            parts_f = pool.submit(
                self.parts_log.write_delta,
                _absolute(add_parts, self.parts_log, ["l_partkey"], "_c"),
                batch_id,
            )
            pairs_f.result()
            parts_f.result()
        # write order is the crash contract: counts first, the order
        # membership log LAST as the replay guard
        self.orders_log.write_delta(
            op.select("l_orderkey").distinct(), batch_id
        )
        if self.pairs_log.delta_count() >= self.compact_every:
            for log in (self.pairs_log, self.parts_log, self.orders_log):
                log.compact(batch_id)

    # ------------------------------------------------------------------
    def similarity(
        self,
        min_support: int = BASKET_MIN_SUPPORT,
        k: int = PART_SIM_TOPK,
    ) -> DataFrame:
        """Per-part top-k cosine neighbors served from state alone —
        the SHARED ``part_sim_from_counts`` kernel over the maintained
        count tables (support filtered at serve time); nothing re-reads
        lineitem. State read through EAGER localCheckpoints (the
        MaintainedPostings.search contract)."""
        pairs = self.pairs_log.read()
        pc = self.parts_log.read()
        if pairs is None or pc is None:
            raise ValueError("MaintainedCopurchase: empty state")
        pairs = (
            pairs.select("part_a", "part_b", "n_both")
            .where(F.col("n_both") >= int(min_support))
            .localCheckpoint(eager=True)
        )
        pc = pc.select("l_partkey", "_c").localCheckpoint(eager=True)
        return part_sim_from_counts(pairs, pc, k)

    def recommendations(
        self,
        query_lineitem: DataFrame,
        min_support: int = BASKET_MIN_SUPPORT,
        k_neighbors: int = PART_SIM_TOPK,
        k: int = PART_REC_TOPK,
    ) -> DataFrame:
        """Basket completion for a QUERY batch of orders against the
        maintained neighbor lists — the live serving pattern (score
        incoming baskets; they need not be ingested). The SHARED
        ``recommend_from_sim`` kernel over :meth:`similarity`'s
        output: scoring ingested orders reproduces the batch
        ``part_recommendations`` exactly (tested; gated as
        ``part_recommendations_maintained``)."""
        op = (
            query_lineitem.select("l_orderkey", "l_partkey")
            .distinct()
            .localCheckpoint()  # join side + anti-join side
        )
        sim = self.similarity(min_support=min_support, k=k_neighbors)
        return recommend_from_sim(op, sim, k)

"""Semantics pins for the late TPC-H shapes (Q1/Q7/Q15) that the
fixture and the star fuzz can't exercise directly: the Q15 exact
revenue tie (BOTH suppliers must survive the max), the Q7 two-nation
disjunctive filter vs the full matrix, and Q1's exact-integer measure
arithmetic against a hand-computed micro frame."""

import datetime

from pyspark.sql import functions as F

from cuda_gis_smoothing_spark.operators.analytics import (
    pricing_summary,
    top_supplier,
    volume_shipping,
)

SF_DIR = "/root/testdata/sf0.001"

_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp_ntz"
)


def _li(spark, rows):
    return spark.createDataFrame(rows, _LI_SCHEMA)


def test_top_supplier_keeps_exact_ties(spark):
    d = datetime.datetime(1997, 2, 1)
    li = _li(
        spark,
        [
            # suppliers 1 and 2 tie EXACTLY (same price/discount);
            # supplier 3 is strictly below; supplier 4 is outside the
            # quarter with a huge line (must not leak in)
            (10, 1, 1, 1, 1.0, 100.00, 0.05, 0.04, "N", "O", d),
            (11, 1, 2, 1, 1.0, 100.00, 0.05, 0.04, "N", "O", d),
            (12, 1, 3, 1, 1.0, 99.99, 0.05, 0.04, "N", "O", d),
            (13, 1, 4, 1, 1.0, 9999.0, 0.0, 0.0, "N", "O",
             datetime.datetime(1998, 2, 1)),
        ],
    )
    supp = spark.createDataFrame(
        [(i, f"Supplier#{i}", 0, 0.0) for i in (1, 2, 3, 4)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    got = sorted(r.s_suppkey for r in top_supplier(supp, li).collect())
    assert got == [1, 2]


def test_volume_shipping_pair_filter_matches_matrix_slice(spark):
    load = lambda t: spark.read.parquet(f"{SF_DIR}/{t}.parquet")
    args = (load("nation"), load("customer"), load("orders"),
            load("supplier"), load("lineitem"))
    full = volume_shipping(*args)
    # pick the busiest pair from the matrix itself (SF-robust)
    top = (
        full.groupBy("supp_nation", "cust_nation")
        .agg(F.sum("n_lineitems").alias("n"))
        .orderBy(F.col("n").desc(), "supp_nation", "cust_nation")
        .first()
    )
    a, b = top.supp_nation, top.cust_nation
    got = {
        tuple(r)
        for r in volume_shipping(*args, nations=(a, b)).collect()
    }
    want = {
        tuple(r)
        for r in full.where(
            F.col("supp_nation").isin(a, b) & F.col("cust_nation").isin(a, b)
        ).collect()
    }
    assert got == want and len(want) > 0
    # same-nation rows are excluded by construction
    assert all(r[0] != r[1] for r in got)


def test_pricing_summary_exact_micro_frame(spark):
    d = datetime.datetime(1997, 6, 1)
    li = _li(
        spark,
        [
            (1, 1, 1, 1, 3.0, 100.00, 0.10, 0.05, "A", "F", d),
            (2, 1, 1, 1, 5.0, 200.00, 0.00, 0.08, "A", "F", d),
            # after the cutoff: excluded
            (3, 1, 1, 1, 7.0, 300.00, 0.00, 0.00, "A", "F",
             datetime.datetime(1999, 1, 1)),
        ],
    )
    row = pricing_summary(li).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.l_returnflag, r.l_linestatus, r.count_order) == ("A", "F", 2)
    assert r.sum_qty == 8.0
    assert r.sum_base_price == 300.0
    # 100*0.9 + 200*1.0 = 290
    assert r.sum_disc_price == 290.0
    # 90*1.05 + 200*1.08 = 94.5 + 216 = 310.5
    assert r.sum_charge == 310.5
    assert r.avg_qty == 4.0
    assert r.avg_price == 150.0
    assert r.avg_disc == 0.05


def test_local_supplier_volume_counts_only_local_lines(spark):
    """Q5's defining predicate: a lineitem counts only when its
    supplier's nation equals the ordering customer's nation — an
    identical line from a foreign supplier must not contribute."""
    from cuda_gis_smoothing_spark.operators.analytics import (
        local_supplier_volume,
    )

    region = spark.createDataFrame(
        [(0, "EUROPE")], "r_regionkey long, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "N_LOCAL", 0), (1, "N_FOREIGN", 0)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    customer = spark.createDataFrame(
        [(1, "Customer#1", 0, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    d_in = datetime.datetime(1997, 1, 1)
    d_out = datetime.datetime(1999, 1, 1)  # outside [start, end)
    orders = spark.createDataFrame(
        [(10, 1, "O", 1.0, d_in, "1-URGENT"), (11, 1, "O", 1.0, d_out, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    supplier = spark.createDataFrame(
        [(1, "S#1", 0, 0.0), (2, "S#2", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    li = _li(
        spark,
        [
            (10, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", d_in),  # local
            (10, 1, 2, 2, 1.0, 100.0, 0.0, 0.0, "N", "O", d_in),  # foreign
            (11, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", d_out),  # late order
        ],
    )
    got = local_supplier_volume(
        region, nation, customer, orders, li, supplier
    ).collect()
    assert len(got) == 1
    assert got[0].n_name == "N_LOCAL"
    assert got[0].n_lineitems == 1
    assert abs(got[0].revenue - 100.0) < 1e-9


def test_integrity_report_counts_engineered_violations(spark):
    """Engineered dirty warehouse: each check must count exactly its
    violations — orphan FKs (including a NULL FK, which LEFT ANTI and
    NOT EXISTS both count), a duplicate PK, a nonpositive quantity, an
    out-of-range discount, and a NULL text."""
    from cuda_gis_smoothing_spark.operators.analytics import integrity_report

    customer = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "dup")], "c_custkey long, c_name string"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 99), (12, None)], "o_orderkey long, o_custkey long"
    )
    lineitem = spark.createDataFrame(
        [(10, 5.0, 0.05), (77, 1.0, 0.05), (10, 0.0, 0.05), (10, 2.0, 1.5)],
        "l_orderkey long, l_quantity double, l_discount double",
    )
    documents = spark.createDataFrame(
        [(1, "x"), (2, None)], "doc_id long, text string"
    )
    events = spark.createDataFrame(
        [(1, "u1"), (2, None)], "event_id long, user_id string"
    )
    got = {
        r.check_name: r.n_violations
        for r in integrity_report(customer, orders, lineitem, documents, events).collect()
    }
    assert got == {
        "customer_dup_pk": 1,
        "orders_orphan_customer": 2,  # o_custkey 99 and NULL
        "lineitem_orphan_order": 1,  # l_orderkey 77
        "lineitem_nonpositive_quantity": 1,
        "lineitem_discount_range": 1,
        "orders_null_custkey": 1,
        "documents_null_text": 1,
        "events_null_user": 1,
    }


def test_customer_rfm_null_monetary_scores_one(spark):
    """Review-catch regression: a customer whose order totals are all
    NULL must score m=1 (the shared rfm_axis_score NULL guard — DuckDB's
    CASE WHEN NULL THEN..ELSE 0 shape), never a NULL segment."""
    import datetime as dt

    from cuda_gis_smoothing_spark.operators.analytics import customer_rfm

    d = dt.datetime(2024, 1, 1)
    rows = [
        (1, 10, "O", 100.0, d, "1-URGENT"),
        (2, 10, "O", 200.0, d + dt.timedelta(days=3), "1-URGENT"),
        (3, 20, "O", None, d, "1-URGENT"),  # all-NULL monetary customer
        (4, 30, "O", 50.0, d + dt.timedelta(days=7), "1-URGENT"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = {r.custkey: r for r in customer_rfm(df).collect()}
    nullc = got[20]
    assert nullc.monetary_cents is None
    assert nullc.m_score == 1
    assert nullc.segment is not None
    for r in got.values():
        assert r.segment == r.r_score * 100 + r.f_score * 10 + r.m_score


def test_part_similarity_and_recommendations_differential(spark):
    """Seeded randomized differential: brute-force Python cosine
    neighbor lists and basket-completion scores over random baskets ==
    the Spark operators (ranks, counts, round6 values)."""
    import math
    import random

    from cuda_gis_smoothing_spark.operators.analytics import (
        part_recommendations,
        part_similarity,
    )

    rng = random.Random(42)
    rows = []
    for o in range(60):
        parts = rng.sample(range(1, 25), rng.randint(1, 6))
        for p in parts:
            # duplicate lineitems for the same part: membership is
            # DISTINCT, so these must not change any count
            for _ in range(rng.randint(1, 2)):
                rows.append((o, p))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    baskets = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
    pc = {}
    pair = {}
    for b in baskets.values():
        for p in b:
            pc[p] = pc.get(p, 0) + 1
        for a in b:
            for c in b:
                if a < c:
                    pair[(a, c)] = pair.get((a, c), 0) + 1
    min_support, kn, kr = 2, 5, 3
    sym = {}
    for (a, c), n in pair.items():
        if n >= min_support:
            cos = round(n / math.sqrt(pc[a] * pc[c]) + 1e-9, 6)
            sym.setdefault(a, []).append((c, n, cos))
            sym.setdefault(c, []).append((a, n, cos))
    want_sim = {}
    for p, lst in sym.items():
        lst.sort(key=lambda t: (-t[2], t[0]))
        for rank, (nb, n, cos) in enumerate(lst[:kn], 1):
            want_sim[(p, nb)] = (n, cos, rank)
    got_sim = {
        (r.part, r.neighbor): (r.n_both, r.cosine, r.rank)
        for r in part_similarity(li, min_support=min_support, k=kn).collect()
    }
    assert got_sim == want_sim and want_sim

    micro = {
        (p, nb): round(v[1] * 1e6) for (p, nb), v in want_sim.items()
    }
    want_rec = {}
    for o, b in baskets.items():
        scores = {}
        for p in b:
            for (pp, nb), mi in micro.items():
                if pp == p and nb not in b:
                    scores[nb] = scores.get(nb, 0) + mi
        ranked = sorted(scores.items(), key=lambda t: (-t[1], t[0]))
        for rank, (nb, sm) in enumerate(ranked[:kr], 1):
            want_rec[(o, nb)] = (round(sm / 1e6 + 1e-9, 6), rank)
    got_rec = {
        (r.l_orderkey, r.part): (r.score, r.rank)
        for r in part_recommendations(
            li, min_support=min_support, k_neighbors=kn, k=kr
        ).collect()
    }
    assert got_rec == want_rec and want_rec

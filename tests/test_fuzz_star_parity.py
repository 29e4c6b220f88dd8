"""Star-join parity fuzz: region_revenue and top_customers over a
synthetic TPC-H-shaped micro-warehouse engineered for the shapes the
fixture can't guarantee — EXACT revenue ties at the top-k boundary
(identical lineitem sets for different customers), a hot customer,
customers without orders, orders without lineitems, nations without
customers, and an empty region. Money stays integer-exact (prices and
discounts on the cent grid), so unlike the float-aggregate families
this fuzz cannot flake on round6 boundaries."""

import datetime
import random

import duckdb
import pytest

from test_entry_parity import assert_gate_on

GATES = [
    "region_revenue",
    "top_customers",
    "late_shipments",
    "promo_revenue",
    "supplier_balances",
    # Q10: returnflag varies by line index (deterministic — doesn't
    # shift the rng stream the engineered ties depend on)
    "returned_revenue",
    # Q13: order-less customers 122-129 pin the LEFT-join zero bucket
    "customer_order_distribution",
    # Q17: small per-part counts — may legally select zero rows, which
    # pins the Spark-side COALESCE(SUM, 0) against the twin's
    "part_quantity_outliers",
    # Q3/Q18: the fuzz dates/quantities sit entirely outside the gate
    # constants (orders are 2024 > the 1998 cutoff; max order qty 200
    # < 300), so these pin the EMPTY-result schema contract
    "shipping_priority",
    "big_orders",
    # Q6/Q19: fuzz shipdates (2024) miss the Q6 year → empty + the
    # coalesce-to-0 sum contract; Q19's brand/size branches DO select
    # fuzz rows (brands Brand#0-4, sizes 1-50)
    "forecast_revenue_change",
    "disjunctive_revenue",
    # basket lift: the hot customer's 12 orders and the engineered
    # identical-lineitem tie orders exercise the pair counts + the
    # round6-lift k-cut tie-break
    "basket_part_pairs",
    # Q21: identical-lineitem tie orders pin the shipdate-tie branch of
    # the top-2 decorrelation (max2 == max1 when two suppliers share
    # the latest shipdate)
    "blocking_suppliers",
    # Q22: the order-less customers 122-129 + negative balances pin
    # the integer rational threshold and the anti-join
    "idle_customers",
    # Q8: the fuzz warehouse has no 'EUROPE'/'NATION_3' — pins the
    # empty-result schema contract (the Q3/Q18 precedent)
    "nation_market_share",
    # Q5: no 'EUROPE' region AND 2024 orders sit outside the 1996-1998
    # window — pins the empty-result schema contract on the
    # local-supplier (s_nationkey = c_nationkey) join
    "local_supplier_volume",
    # Q1: fuzz shipdates (2024) all sit after the 1998 cutoff → pins
    # the empty-result schema contract; Q15's 1997 quarter likewise
    "pricing_summary",
    "top_supplier",
    # Q7: supplier nations 0-7 x customer nations 0-5 — non-empty,
    # pins the cross-nation matrix incl. customer-less nations 6/7
    "volume_shipping",
    # Q16-adapted: distinct-supplier variety over the fuzz brands
    # (Brand#0-4) — the NOT-predicates select real rows; integer
    # distinct counts are tie-proof
    "supplier_part_variety",
    # integer day lags through the exact percentile kernel — tied
    # ship/order dates collapse into equal lags identically
    "shipping_lag_percentiles",
    # Benford digits: the identical-lineitem tie orders concentrate
    # first digits; zero-count digits pin the 9-row LEFT-join contract
    "value_benford",
    # concentration: the hot customer (12 orders) pins the top-1 whale
    # share; equal-total customers pin the tie-block rank invariance
    "revenue_concentration",
    # join-size card: identical-lineitem tie orders give repeated part
    # keys — pins the portable sample hash + integer pair mass
    "join_size_report",
    # winsorized card: equal-total tie blocks can straddle the p05/p95
    # fences — pins the identical-fence-double compare contract
    "value_winsorized",
    # RFM: integer axes vs quartiles of the SAME integers; engineered
    # order-count/total ties pin the score-boundary compares
    "customer_rfm",
    # epoch-anchored integer month ids + exact cents — the revenue
    # tie blocks pin the first-month argmin
    "cohort_revenue",
    # LAG over the (date, orderkey) total order: same-date order pairs
    # (gap 0) pin the tie-break determinism
    "order_gap_days",
    # Q21 sole-late variant: multi-supplier orders where exactly one
    # supplier crosses the 60-day grace — the identical-lineitem tie
    # orders pin the every-supplier-late exclusion branch
    "waiting_suppliers",
    # Q9-adapted: fuzz part names ("Part#N") miss the '%widget%' LIKE
    # → pins the empty-result schema contract (the Q3/Q18 precedent)
    "nation_profit",
    # item-item CF: the identical-lineitem tie orders create equal
    # co-purchase counts → pins the round6-cosine rank tie-break
    "part_similarity",
    # basket completion: integer micro-cosine sums — equal-score
    # candidates pin the per-order integer rank tie-break
    "part_recommendations",
    # user-user CF (the kernel's second domain): the hot customer's 12
    # orders concentrate part co-membership — pins the aliased-domain
    # counts + round6-cosine rank tie-break
    "customer_similarity",
    # co-purchase pagerank: the identical-lineitem tie orders shape
    # the support-filtered edge set — pins the 5-round chain over the
    # fuzz graph (symmetric parts get identical round6 ranks)
    "part_pagerank",
    # per-customer completion: the hot customer's 12-order history
    # pins the history-basket micro-cosine sums + owned-part anti-join
    "customer_recommendations",
]


def _warehouse(seed: int = 7):
    rng = random.Random(seed)
    region = [(i, f"R{i}") for i in range(3)]  # R2 left empty of nations
    nation = [(i, f"N{i}", [0, 0, 1, 1, 1, 0][i % 6]) for i in range(8)]
    # nations 6,7 get no customers
    customer = [
        (100 + c, f"Customer#{c}", nation[c % 6][0], round(rng.uniform(-500, 5000), 2), "BUILDING")
        for c in range(30)
    ]
    orders, lineitem = [], []
    okey = 1000
    base = datetime.datetime(2024, 3, 1)

    def add_order(cust, lines):
        nonlocal okey
        okey += 1
        orders.append(
            (okey, cust, "O", round(rng.uniform(10, 9000), 2),
             base + datetime.timedelta(days=rng.randint(0, 60)), "1-URGENT")
        )
        for i, (qty, price, disc) in enumerate(lines):
            lineitem.append(
                (okey, rng.randint(1, 50), rng.randint(1, 10), i + 1,
                 float(qty), price, disc, 0.04,
                 "R" if (okey + i) % 3 == 0 else "N", "O",
                 base + datetime.timedelta(days=rng.randint(0, 90)))
            )

    def rand_lines(n):
        return [
            (rng.randint(1, 40),
             round(rng.choice([10.25, 99.99, 5.00, 250.50, 33.33]) * rng.randint(1, 4), 2),
             rng.choice([0.0, 0.01, 0.05, 0.10]))
            for _ in range(n)
        ]

    # 22 customers with orders; c=8's order has no lineitems, so 21
    # customers carry revenue and k=20 cuts between ranks 20 and 21
    tie_lines = rand_lines(3)
    boundary_lines = [(1, 0.25, 0.0)]  # 0.25 — strictly below all others
    for c in range(22):
        cust = 100 + c
        if c in (4, 5, 6):          # THREE customers tied mid-ranking
            add_order(cust, tie_lines)
        elif c == 7:                # hot customer: many orders
            for _ in range(12):
                add_order(cust, rand_lines(rng.randint(1, 4)))
        elif c == 8:                # order with NO lineitems
            add_order(cust, [])
        elif c in (20, 21):         # identical LOWEST revenue: the tie
            add_order(cust, boundary_lines)  # STRADDLES the k=20 cut
        else:
            add_order(cust, rand_lines(rng.randint(1, 5)))
    # part keys 1..50 are referenced by lineitem; 51-60 never are.
    # cent-grid retail prices keep the money contract
    part = [
        (p, f"Part#{p}", f"Brand#{p % 5}",
         rng.choice(["PROMO", "STANDARD", "ECONOMY"]), rng.randint(1, 50),
         round(rng.uniform(1, 500), 2))
        for p in range(1, 61)
    ]
    # suppliers spread over every nation incl. the customer-less ones
    supplier = [
        (s, f"Supplier#{s}", nation[s % 8][0], round(rng.uniform(-999, 9999.99), 2))
        for s in range(1, 13)
    ]
    return {
        "region": region,
        "nation": nation,
        "customer": customer,
        "orders": orders,
        "lineitem": lineitem,
        "part": part,
        "supplier": supplier,
    }


SCHEMAS = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    "orders": "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    "lineitem": (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp_ntz"
    ),
    "part": (
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double"
    ),
    "supplier": "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
}


@pytest.fixture(scope="module")
def star_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_star_sf")
    wh = _warehouse()
    for t, rows in wh.items():
        spark.createDataFrame(rows, SCHEMAS[t]).coalesce(1).write.parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.fixture(scope="module")
def star_ddb(star_dir):
    con = duckdb.connect()
    for t in SCHEMAS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{star_dir}/{t}.parquet/*.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", GATES)
def test_star_gate_matches_oracle_on_tie_corpus(spark, star_dir, star_ddb, name):
    assert_gate_on(spark, star_ddb, name, star_dir)


def test_top_customers_boundary_tie_is_real(spark, star_dir):
    """Prove the corpus actually exercises the two tie classes: the
    mid-ranking three-way tie appears in the output, and the cut at
    k=20 falls BETWEEN the two identically-lowest customers — the one
    with the smaller key is selected, the other excluded (the
    deterministic tiebreak both engines must share)."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["top_customers"](spark, star_dir).collect()
    assert len(rows) == 20
    keys = {r.c_custkey for r in rows}
    assert 120 in keys and 121 not in keys, "k cut is not on the tie"
    revs = [r.revenue for r in rows]
    assert len(revs) != len(set(revs)), "mid-ranking tie lost"
    assert min(revs) == 0.25  # the boundary pair's engineered revenue

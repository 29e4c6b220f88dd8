"""Star-schema analytics over the TPC-H-ish tables: the canonical
dimension-broadcast join chains an analytics engine must plan well.

Join shape (100 TB): region (5 rows) and nation (25) are explicit
``broadcast()`` sides — no shuffle for the dimension hops; customer ⋈
orders ⋈ lineitem are hash-shuffle equi-joins on their keys (uniform,
no skew levers needed) with AQE picking build sides at runtime. The
revenue measure is EXACT fixed-point: prices and discounts are 2-dp
decimals stored as doubles, so ``round(x*100)`` recovers exact integer
cents and the sum is association-free (the smooth_scatter_int
precedent) — cross-engine hash-identical regardless of partitioning.
Integer bound: cents x percent sums stay < 2^62 up to ~4e9 lineitems
at max price; beyond that use decimal(38,4) sums (DuckDB's HUGEINT
already is one).
"""

from __future__ import annotations

import re as _re
from datetime import datetime as _datetime

from pyspark.sql import DataFrame, Window, functions as F

from cuda_gis_smoothing_spark.functions.numeric import round6

def _rev_scaled():
    """Revenue scaled by 10^4 (cents x remaining-percent), exact
    integer — built lazily: Column construction needs an active
    SparkContext, and oracle_sql() (the DuckDB-only half of the driver
    contract) must stay importable without one."""
    return F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )

_REV_SCALED_SQL = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)


def region_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5-shaped rollup: lineitem revenue by (region, nation)
    through the full dimension chain. Output: (r_name, n_name,
    n_lineitems, revenue)."""
    dims = (
        F.broadcast(region.select("r_regionkey", "r_name"))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "r_name", "n_name")
    )
    cust = customer.select("c_custkey", "c_nationkey").join(
        F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey")
    )
    ords = orders.select("o_orderkey", "o_custkey").join(
        cust.select("c_custkey", "r_name", "n_name"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    li = lineitem.select("l_orderkey", _rev_scaled().alias("_rev")).join(
        ords.select("o_orderkey", "r_name", "n_name"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return li.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        round6(F.sum("_rev") / F.lit(10_000.0)).alias("revenue"),
    )


REGION_REVENUE_SQL = f"""
SELECT r.r_name, n.n_name,
       COUNT(*) AS n_lineitems,
       ROUND(SUM({_REV_SCALED_SQL}) / 10000.0 + 1e-09, 6) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY r.r_name, n.n_name
""".strip()


def top_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shaped top-k: the ``k`` customers by total lineitem
    revenue (exact integer ties broken by c_custkey). orderBy + limit
    plans as TakeOrderedAndProject — distributed per-partition top-k,
    no global sort. Output: (c_custkey, c_name, revenue, rank)."""
    rev = (
        lineitem.select("l_orderkey", _rev_scaled().alias("_rev"))
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("_rev").alias("_rev_total"))
    )
    top = (
        rev.orderBy(F.col("_rev_total").desc(), F.col("o_custkey").asc())
        .limit(k)
        .join(
            customer.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    w = Window.orderBy(F.col("_rev_total").desc(), F.col("c_custkey").asc())
    return top.select(
        "c_custkey",
        "c_name",
        round6(F.col("_rev_total") / F.lit(10_000.0)).alias("revenue"),
        F.row_number().over(w).alias("rank"),
    )


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format numeric profile (the dataset-card / data-quality
    report): per column — row count, nulls, exact distinct count, min,
    max, mean. ONE aggregate pass over the table (Catalyst plans the
    multiple DISTINCT aggregates with a single expand), then a stack
    unpivot of the 1-row result — vs the oracle's per-column UNION.
    At 100 TB swap exact n_distinct for ``approx_count_distinct``
    (engine-private sketch, so the exact form is what the gate checks).
    Output: (column, n, n_null, n_distinct, min_value, max_value,
    avg_value)."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"_n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            # min/max are arithmetic-free passthroughs, but EVERY float
            # column in a gated output goes through round6 (the repo's
            # cross-engine tie rule) so a future decimal-typed or
            # derived column can't silently diverge
            round6(F.min(c).cast("double")).alias(f"_mn_{c}"),
            round6(F.max(c).cast("double")).alias(f"_mx_{c}"),
            round6(F.avg(c)).alias(f"_av_{c}"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _n_{c}, _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}, _av_{c}"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(column, n, n_null, n_distinct, min_value, max_value, avg_value)"
        )
    )


def profile_numeric_sql(table: str, cols: list[str]) -> str:
    parts = [
        f"""SELECT '{c}' AS "column", COUNT({c}) AS n,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       ROUND(CAST(MIN({c}) AS DOUBLE) + 1e-09, 6) AS min_value,
       ROUND(CAST(MAX({c}) AS DOUBLE) + 1e-09, 6) AS max_value,
       ROUND(AVG({c}) + 1e-09, 6) AS avg_value
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


def top_customers_sql(k: int = 20) -> str:
    return f"""
WITH rev AS (
  SELECT o.o_custkey, SUM({_REV_SCALED_SQL}) AS rev_total
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_custkey
),
top AS (
  SELECT o_custkey, rev_total FROM rev
  ORDER BY rev_total DESC, o_custkey ASC LIMIT {k}
)
SELECT c.c_custkey, c.c_name,
       ROUND(t.rev_total / 10000.0 + 1e-09, 6) AS revenue,
       CAST(ROW_NUMBER() OVER (ORDER BY t.rev_total DESC, c.c_custkey ASC) AS INT) AS rank
FROM top t JOIN customer c ON c.c_custkey = t.o_custkey
""".strip()


#: late-shipment grace period (exact integer microseconds)
LATE_SHIP_GRACE_US = 60 * 86_400 * 1_000_000


def late_shipment_priority(
    orders: DataFrame, lineitem: DataFrame, grace_us: int = LATE_SHIP_GRACE_US
) -> DataFrame:
    """TPC-H Q4-shaped order-priority audit: per priority, how many
    orders have AT LEAST ONE lineitem shipped more than the grace
    period after the order date — the canonical EXISTS/semi-join plan
    shape (every other star gate is an inner/broadcast chain; this
    pins LEFT SEMI). Output: (o_orderpriority, n_orders,
    n_late_orders, late_share).

    The lateness predicate is exact integer microseconds
    (``timestampdiff`` between two NTZ values — the event_micros
    timezone-free contract), and late_share is an integer-over-integer
    round6. Plan (100 TB): one hash semi-join shuffled on the order
    key (the date predicate rides the join condition, so a matched
    order short-circuits without materializing its other lineitems),
    two priority-sized hash aggregates, one tiny left join."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    o = orders.select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.expr("timestampdiff(MICROSECOND, o_orderdate, l_shipdate)")
            > F.lit(grace_us)
        ),
        "left_semi",
    )
    tot = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    ln = late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_late_orders")
    )
    return tot.join(ln, "o_orderpriority", "left").select(
        "o_orderpriority",
        "n_orders",
        F.coalesce("n_late_orders", F.lit(0)).cast("long").alias("n_late_orders"),
        round6(
            F.coalesce("n_late_orders", F.lit(0)) / F.col("n_orders")
        ).alias("late_share"),
    )


def late_shipment_sql(grace_us: int = LATE_SHIP_GRACE_US) -> str:
    return f"""
WITH late AS (
  SELECT o_orderkey, o_orderpriority FROM orders o
  WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate) > {grace_us}
  )
),
tot AS (SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders GROUP BY 1),
ln AS (SELECT o_orderpriority, COUNT(*) AS n_late_orders FROM late GROUP BY 1)
SELECT tot.o_orderpriority,
       CAST(tot.n_orders AS BIGINT) AS n_orders,
       CAST(COALESCE(ln.n_late_orders, 0) AS BIGINT) AS n_late_orders,
       ROUND(COALESCE(ln.n_late_orders, 0) * 1.0 / tot.n_orders + 1e-09, 6)
         AS late_share
FROM tot LEFT JOIN ln USING (o_orderpriority)
""".strip()


def promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: share of lineitem revenue from PROMO-type
    parts — the lineitem ⋈ part dimension hop (the one TPC-H table no
    other gate touched). Revenue stays on the exact integer cents ×
    percent grid (``_rev_scaled``), so the share is an
    integer-over-integer round6 and the gate is association-proof.
    Output: one row (n_lineitems, promo_revenue_scaled,
    total_revenue_scaled, promo_share).

    Plan (100 TB): part is an explicit ``broadcast()`` side (a
    dimension — same treatment as region/nation); one scan of
    lineitem, one 1-row conditional aggregate; no shuffle at all
    beyond the final 1-row collapse."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    rev = _rev_scaled()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    j = lineitem.select("l_partkey", "l_extendedprice", "l_discount").join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.sum(promo).cast("long").alias("promo_revenue_scaled"),
        F.sum(rev).cast("long").alias("total_revenue_scaled"),
        round6(F.sum(promo) / F.sum(rev)).alias("promo_share"),
    )


PROMO_REVENUE_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SCALED_SQL} ELSE 0 END) AS BIGINT)
         AS promo_revenue_scaled,
       CAST(SUM({_REV_SCALED_SQL}) AS BIGINT) AS total_revenue_scaled,
       ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SCALED_SQL} ELSE 0 END) * 1.0
             / SUM({_REV_SCALED_SQL}) + 1e-09, 6) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
""".strip()


def supplier_balances(
    supplier: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Per-nation supplier census: count + exact-cent account-balance
    total through the region/nation dimension chain — brings the
    SUPPLIER table under the gate wall (the last untouched fixture
    table). Balances are 2-dp money: ``round(x*100)`` recovers exact
    integer cents (the region_revenue fixed-point contract), so the
    sums are association-free. Output: (r_name, n_name, n_suppliers,
    total_acctbal_cents).

    Plan (100 TB): two broadcast dimension hops, one nation-sized hash
    aggregate."""
    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    dims = F.broadcast(
        region.select("r_regionkey", "r_name")
    ).join(
        F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        supplier.select("s_nationkey", cents.alias("_c"))
        .join(F.broadcast(dims), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("_c").cast("long").alias("total_acctbal_cents"),
        )
    )


SUPPLIER_BALANCES_SQL = """
SELECT r_name, n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS total_acctbal_cents
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name, n_name
""".strip()


# -- round-5 late additions: the remaining canonical TPC-H plan shapes --

#: Q3 cutoff / Q18 quantity floor — fixture orderdates span 1995-2001
#: and per-order quantity p99 is ~262, so both constants cut non-
#: degenerate subsets at every SF.
SHIP_CUTOFF = "1998-06-01 00:00:00"
BIG_ORDER_MIN_QTY = 300
TOPK_DEFAULT = 20

_SEGMENT_RE = _re.compile(r"^[A-Z]+$")


def _check_segment(segment: str) -> str:
    """Segment is interpolated into a Spark filter and the SQL twin —
    whitelist it (the check_terms precedent for interpolated params)."""
    if not _SEGMENT_RE.match(segment):
        raise ValueError(f"invalid market segment: {segment!r}")
    return segment


def _check_cutoff(cutoff: str) -> str:
    """Cutoff is interpolated into TIMESTAMP literals on both sides —
    require an exact 'YYYY-MM-DD HH:MM:SS' parse before interpolation."""
    _datetime.strptime(cutoff, "%Y-%m-%d %H:%M:%S")
    return cutoff


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = SHIP_CUTOFF,
    k: int = TOPK_DEFAULT,
) -> DataFrame:
    """TPC-H Q3 shape: top-k highest-revenue orders placed before the
    cutoff with lineitems still shipping after it, for one market
    segment — the selective-dimension-filter + two-fact-join + top-k
    plan (the segment filter prunes customer BEFORE the join chain, so
    Catalyst pushes it into the scan). Revenue is exact scaled cents ×
    percent; the top-k total order is (revenue_scaled DESC, o_orderkey)
    — integer, tie-proof. Output: (o_orderkey, order_date, n_items,
    revenue).

    Plan (100 TB): segment-filtered customer ⋈ date-filtered orders ⋈
    date-filtered lineitem, all hash equi-joins on their keys; one
    order-keyed aggregate; TakeOrderedAndProject for the top-k (no
    global sort)."""
    segment, cutoff = _check_segment(segment), _check_cutoff(cutoff)
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(
        F.col("o_orderdate") < F.expr(f"TIMESTAMP_NTZ '{cutoff}'")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = lineitem.where(
        F.col("l_shipdate") > F.expr(f"TIMESTAMP_NTZ '{cutoff}'")
    ).select("l_orderkey", _rev_scaled().alias("_rev"))
    per_order = (
        ords.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("_rev").alias("_rev_scaled"),
        )
    )
    return (
        per_order.orderBy(F.col("_rev_scaled").desc(), "o_orderkey")
        .limit(k)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
            "n_items",
            round6(F.col("_rev_scaled") / F.lit(10_000.0)).alias("revenue"),
        )
    )


def shipping_priority_sql(
    segment: str = "BUILDING", cutoff: str = SHIP_CUTOFF, k: int = TOPK_DEFAULT
) -> str:
    segment, cutoff, k = _check_segment(segment), _check_cutoff(cutoff), int(k)
    return f"""
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM({_REV_SCALED_SQL}) / 10000.0 + 1e-09, 6) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '{cutoff}'
  AND l_shipdate > TIMESTAMP '{cutoff}'
GROUP BY o_orderkey, o_orderdate
ORDER BY SUM({_REV_SCALED_SQL}) DESC, o_orderkey
LIMIT {k}
""".strip()


def returned_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    k: int = TOPK_DEFAULT,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue LOST to returned
    items (l_returnflag = 'R') — the returns-exposure ranking. Same
    exact-cents total order contract as shipping_priority
    ((revenue_scaled DESC, c_custkey)). Output: (c_custkey, c_name,
    n_items, revenue).

    Plan (100 TB): the returnflag filter reaches the lineitem scan
    (1/3 selectivity); orders ⋈ lineitem shuffles on the order key,
    the per-customer aggregate shuffles on custkey, then the
    customer-name join runs over only the aggregated (customer-
    cardinality) side; top-k is TakeOrderedAndProject."""
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", _rev_scaled().alias("_rev")
    )
    per_cust = (
        orders.select("o_orderkey", "o_custkey")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("_rev").alias("_rev_scaled"),
        )
    )
    return (
        per_cust.join(
            customer.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .orderBy(F.col("_rev_scaled").desc(), "c_custkey")
        .limit(k)
        .select(
            "c_custkey",
            "c_name",
            "n_items",
            round6(F.col("_rev_scaled") / F.lit(10_000.0)).alias("revenue"),
        )
    )


def returned_revenue_sql(k: int = TOPK_DEFAULT) -> str:
    k = int(k)  # interpolated below
    return f"""
SELECT c_custkey, c_name,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM({_REV_SCALED_SQL}) / 10000.0 + 1e-09, 6) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY SUM({_REV_SCALED_SQL}) DESC, c_custkey
LIMIT {k}
""".strip()


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: the orders-per-customer histogram INCLUDING
    zero-order customers — the one star gate whose join must be LEFT
    OUTER (an inner chain silently drops the zero bucket; the fuzz
    warehouse has order-less customers to pin it). Output:
    (n_orders, n_customers), both exact counts.

    Plan (100 TB): left join shuffled on custkey, per-customer count,
    then a tiny second aggregate over distinct order-counts."""
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
GROUP BY n_orders
""".strip()


def part_quantity_outliers(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q17 shape: revenue sitting in lineitems whose quantity is
    BELOW 20% of their part's average order quantity (the small-lot
    audit). The threshold compare is pure integer —
    ``5·qty·cnt < sum_qty`` (quantities are whole units; exact) — so
    the boundary can never flake cross-engine, and revenue is exact
    extended-price cents. Output: one row (n_lineitems, n_parts,
    revenue_cents).

    Plan (100 TB): one per-part aggregate (map-side combined) joined
    back to lineitem on l_partkey — the canonical correlated-subquery
    decorrelation — then a 1-row conditional aggregate. Integer bound:
    5·qty·cnt ≤ 250·per-part-rows < 2^62 up to ~1.8e16 rows/part."""
    q = F.round(F.col("l_quantity")).cast("long")
    li = lineitem.select(
        "l_partkey",
        q.alias("_q"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("_cents"),
    )
    per_part = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("_cnt"), F.sum("_q").alias("_sum_q")
    )
    return (
        li.join(per_part, "l_partkey")
        .where(F.lit(5) * F.col("_q") * F.col("_cnt") < F.col("_sum_q"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.count_distinct(F.col("l_partkey")).cast("long").alias("n_parts"),
            # coalesce: an empty filter leaves SUM NULL in Spark while the
            # twin's COALESCE emits 0 — pin both to 0
            F.coalesce(F.sum("_cents"), F.lit(0)).cast("long").alias(
                "revenue_cents"
            ),
        )
    )


PART_QUANTITY_OUTLIERS_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(ROUND(l_quantity) AS BIGINT) AS q,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
pp AS (SELECT l_partkey, COUNT(*) AS cnt, SUM(q) AS sum_q FROM li GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(COUNT(DISTINCT li.l_partkey) AS BIGINT) AS n_parts,
       CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS revenue_cents
FROM li JOIN pp ON li.l_partkey = pp.l_partkey
WHERE 5 * q * cnt < sum_q
""".strip()


def big_orders(
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: int = BIG_ORDER_MIN_QTY,
    k: int = TOPK_DEFAULT,
) -> DataFrame:
    """TPC-H Q18 shape: top-k largest orders by total line quantity
    above a floor — the HAVING-over-fact-aggregate plan. Quantities
    are whole units, so the filter, ranking, and tie-break
    ((total_qty DESC, o_orderkey)) are all integer-exact. Output:
    (o_orderkey, o_custkey, order_date, n_items, total_qty).

    Plan (100 TB): one order-keyed aggregate over lineitem (map-side
    combined), HAVING prunes to the rare tail BEFORE the orders join,
    so the join's left side is tiny; TakeOrderedAndProject top-k."""
    q = F.round(F.col("l_quantity")).cast("long")
    per_order = (
        lineitem.select("l_orderkey", q.alias("_q"))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("_q").alias("total_qty"),
        )
        .where(F.col("total_qty") > min_qty)
    )
    return (
        per_order.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(k)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
            "n_items",
            F.col("total_qty").cast("long").alias("total_qty"),
        )
    )


def big_orders_sql(
    min_qty: int = BIG_ORDER_MIN_QTY, k: int = TOPK_DEFAULT
) -> str:
    min_qty, k = int(min_qty), int(k)  # interpolated below
    return f"""
WITH po AS (
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > {min_qty}
)
SELECT o_orderkey, o_custkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
       n_items, total_qty
FROM po JOIN orders ON o_orderkey = l_orderkey
ORDER BY total_qty DESC, o_orderkey
LIMIT {k}
""".strip()


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Join/aggregation-key skew diagnostic — the measurement step
    BEFORE the salting/AQE levers (plans/partitioning.salted_join,
    salted mean): per-key counts reduced to one row of
    ``(n_keys, n_rows, max_count, top1_share, gini)``. A gini near 0
    means uniform keys (plain hash shuffle is fine); near 1 means a
    handful of hot keys own the table (salt or isolate them).

    Cross-engine contract: ranks come from the partition-parallel
    :func:`~cuda_gis_smoothing_spark.plans.partitioning.global_ranks`
    (quantile boundaries — count distributions are exactly the skewed
    case) ordered by ``(cnt, key)``; rank ORDER within a tie block of
    equal counts is engine-dependent (NULL-key placement) but the gini
    rank sum is TIE-PERMUTATION-INVARIANT (i·x + j·x = j·x + i·x — the
    zipf_fit lesson), so the aggregate is exact. Gini =
    ``(2·Σ i·cnt_i − (n+1)·Σcnt) / (n·Σcnt)`` — integer numerator and
    denominator, ONE double division. Int64 bound: needs
    ``n_keys · n_rows < 2^62`` (holds to ~10^9 keys × 10^9 rows;
    beyond that, compute over the KMV/quantile sketch family instead).

    Plan (100 TB): one key-count aggregate (map-side combined), the
    bucketed rank kernel (no global window), one 1-row aggregate."""
    from cuda_gis_smoothing_spark.plans.partitioning import global_ranks

    counts = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    ranked = global_ranks(
        counts, ["cnt", "_k"], out_col="_i", boundaries="quantile"
    )
    n, tot = F.count(F.lit(1)), F.sum("cnt")
    gini = (
        (F.lit(2) * F.sum(F.col("_i") * F.col("cnt")) - (n + 1) * tot)
        .cast("double")
        / (n * tot).cast("double")
    )
    return ranked.agg(
        n.cast("long").alias("n_keys"),
        tot.cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_count"),
        round6(F.max("cnt").cast("double") / tot.cast("double")).alias(
            "top1_share"
        ),
        round6(gini).alias("gini"),
    )


def key_skew_report_sql(table: str, key_col: str) -> str:
    """DuckDB twin of :func:`key_skew_report` (HUGEINT-safe: the gini
    ratio converts exact integers to double only at the division)."""
    return f"""
WITH c AS (SELECT {key_col} AS k, COUNT(*) AS cnt FROM {table} GROUP BY 1),
r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt, k) AS i FROM c)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(MAX(cnt) AS BIGINT) AS max_count,
       ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) + 1e-09, 6)
         AS top1_share,
       ROUND(CAST(2 * SUM(i * cnt) - (COUNT(*) + 1) * SUM(cnt) AS DOUBLE)
             / CAST(COUNT(*) * SUM(cnt) AS DOUBLE) + 1e-09, 6) AS gini
FROM r
""".strip()


#: Q6 constants — fixture shipdates span 1995-2001, discounts
#: {0, 0.01..0.10}, quantities 1..50, so every predicate cuts a
#: non-degenerate subset at every SF.
Q6_YEAR = 1997
Q6_DISCOUNT_CENTIPCT = 5  # 0.05 on the integer percent grid
Q6_MAX_QTY = 24


def forecast_revenue_change(
    lineitem: DataFrame,
    year: int = Q6_YEAR,
    discount_pct: int = Q6_DISCOUNT_CENTIPCT,
    max_qty: int = Q6_MAX_QTY,
) -> DataFrame:
    """TPC-H Q6 shape: the pure predicate-pushdown scan-aggregate —
    revenue that would be recovered by dropping small-lot discounts in
    one year. EVERY predicate is integer-exact: the year bounds are
    timestamp literals pushed to the scan, the discount band compares
    on the integer percent grid (``round(d*100)`` — a float compare on
    0.05±0.01 would straddle representation error), and quantity is a
    whole unit. Measure = Σ cents·percent exact integers. Output: one
    row (n_lineitems, revenue).

    Plan (100 TB): one scan; the shipdate bounds reach PushedFilters
    and prune row groups via parquet min/max stats (the
    round()-wrapped discount/quantity predicates are expression
    filters evaluated post-scan — a cast-free schema would push them
    too), one 1-row partial+final aggregate — zero shuffles beyond the
    1-row exchange."""
    year, discount_pct, max_qty = int(year), int(discount_pct), int(max_qty)
    d_pct = F.round(F.col("l_discount") * 100).cast("long")
    rev_cents_pct = (
        F.round(F.col("l_extendedprice") * 100).cast("long") * d_pct
    )
    li = lineitem.where(
        (F.col("l_shipdate") >= F.expr(f"TIMESTAMP_NTZ '{year}-01-01 00:00:00'"))
        & (
            F.col("l_shipdate")
            < F.expr(f"TIMESTAMP_NTZ '{year + 1}-01-01 00:00:00'")
        )
        & (F.round(F.col("l_quantity")).cast("long") < max_qty)
    )
    return (
        li.where(
            (d_pct >= discount_pct - 1) & (d_pct <= discount_pct + 1)
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            round6(
                F.coalesce(F.sum(rev_cents_pct), F.lit(0)) / F.lit(10_000.0)
            ).alias("revenue"),
        )
    )


def forecast_revenue_change_sql(
    year: int = Q6_YEAR,
    discount_pct: int = Q6_DISCOUNT_CENTIPCT,
    max_qty: int = Q6_MAX_QTY,
) -> str:
    year, discount_pct, max_qty = int(year), int(discount_pct), int(max_qty)
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       ROUND(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                          * CAST(ROUND(l_discount * 100) AS BIGINT)), 0)
             / 10000.0 + 1e-09, 6) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{year}-01-01'
  AND l_shipdate < TIMESTAMP '{year + 1}-01-01'
  AND CAST(ROUND(l_quantity) AS BIGINT) < {max_qty}
  AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN {discount_pct - 1} AND {discount_pct + 1}
""".strip()


#: Q19-adapted disjunctive branches over the fixture's part columns
#: (no p_container in this schema): (brand, size range, qty range).
Q19_BRANCHES = (
    ("Brand#1", 1, 15, 1, 11),
    ("Brand#2", 10, 30, 10, 20),
    ("Brand#3", 25, 50, 20, 30),
)


def disjunctive_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    branches: tuple = Q19_BRANCHES,
) -> DataFrame:
    """TPC-H Q19 shape (adapted to this schema's part columns): revenue
    matching an OR of (brand, size-range, quantity-range) conjunctions
    — the disjunctive join-predicate plan. The join key stays a clean
    equi-join on partkey with the OR evaluated as a post-join filter
    (Catalyst also derives the pushable per-side implications); all
    compares are integer-exact. Output: one row (n_lineitems, revenue).

    Plan (100 TB): part is the broadcast side (dimension-sized); one
    hash equi-join on l_partkey; 1-row aggregate."""
    if not branches:  # the twin's empty WHERE would be a syntax error
        raise ValueError("disjunctive_revenue needs at least one branch")
    q = F.round(F.col("l_quantity")).cast("long")
    cond = F.lit(False)
    for brand, lo_sz, hi_sz, lo_q, hi_q in branches:
        # interpolated into the twin too — whitelist the 'Brand#N' form
        # (fullmatch: Python's $ matches before a trailing newline —
        # the \A..\z anchor class)
        if not _re.fullmatch(r"Brand#[0-9]+", brand):
            raise ValueError(f"invalid brand: {brand!r}")
        cond = cond | (
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(int(lo_sz), int(hi_sz)))
            & (q.between(int(lo_q), int(hi_q)))
        )
    joined = lineitem.select(
        "l_partkey", "l_quantity", _rev_scaled().alias("_rev")
    ).join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return joined.where(cond).agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        round6(
            F.coalesce(F.sum("_rev"), F.lit(0)) / F.lit(10_000.0)
        ).alias("revenue"),
    )


def disjunctive_revenue_sql(branches: tuple = Q19_BRANCHES) -> str:
    if not branches:
        raise ValueError("disjunctive_revenue needs at least one branch")
    ors = []
    for brand, lo_sz, hi_sz, lo_q, hi_q in branches:
        if not _re.fullmatch(r"Brand#[0-9]+", brand):
            raise ValueError(f"invalid brand: {brand!r}")
        ors.append(
            f"(p_brand = '{brand}' AND p_size BETWEEN {int(lo_sz)} AND {int(hi_sz)}"
            f" AND CAST(ROUND(l_quantity) AS BIGINT) BETWEEN {int(lo_q)} AND {int(hi_q)})"
        )
    cond = "\n   OR ".join(ors)
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       ROUND(COALESCE(SUM({_REV_SCALED_SQL}), 0) / 10000.0 + 1e-09, 6) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {cond}
""".strip()


BASKET_MIN_SUPPORT = 2
BASKET_TOPK = 50


def _order_part_distinct(lineitem: DataFrame) -> DataFrame:
    """The distinct (order, part) membership table — localCheckpoint'ed
    because every basket-family consumer reads it 3-4 differently-pruned
    ways (the bm25-postings multi-consumer class). Shared by
    :func:`basket_part_pairs` and :func:`part_similarity`."""
    return (
        lineitem.select("l_orderkey", "l_partkey").distinct().localCheckpoint()
    )


def _copurchase_pairs(op: DataFrame, min_support: int) -> DataFrame:
    """(part_a < part_b, n_both) co-order pair counts over the distinct
    membership table — the bounded per-order self-join (fan-out ≤
    (items/order)², the cross_source_dups class), support-filtered."""
    a = op.select(
        F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("part_a")
    )
    b = op.select(
        F.col("l_orderkey").alias("_o2"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(
            b,
            (F.col("_o") == F.col("_o2"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .where(F.col("n_both") >= int(min_support))
    )


def _basket_ctes(
    min_support: int,
    op_sql: str = "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem",
) -> str:
    """op / pc / pairs CTE text — the ONE co-membership derivation the
    basket_part_pairs / part_similarity / customer_similarity twins
    share. ``op_sql`` supplies the (basket, item) membership table
    under the kernel's canonical column names (l_orderkey = basket,
    l_partkey = item) — the caller aliases its domain in, exactly as
    the Spark side does."""
    return f"""op AS ({op_sql}),
pc AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM op GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {int(min_support)}
)""".strip()


def basket_part_pairs(
    lineitem: DataFrame,
    min_support: int = BASKET_MIN_SUPPORT,
    k: int = BASKET_TOPK,
) -> DataFrame:
    """Market-basket association: top-``k`` part pairs by LIFT among
    pairs co-ordered at least ``min_support`` times — the
    frequently-bought-together report as one bounded self-join.

    ``lift(a,b) = N·c(ab) / (c(a)·c(b))`` over distinct (order, part)
    rows — all exact integer counts, ONE double division, round6; the
    k-cut total-orders on (lift, part_a, part_b). Int64 bound:
    ``c(ab)·N < 2^62`` (c(ab) ≤ N, so N < 2^31 orders — beyond that
    compute lift in the log domain or pre-scale).

    Plan (100 TB): the self-join fans out ≤ (items/order)² rows per
    order — bounded by the order-size cap, never corpus-quadratic (the
    cross_source_dups class); pair counts hash-aggregate with map-side
    combine; part counts and the 1-row N broadcast; k-cut is
    TakeOrderedAndProject. The distinct (order, part) table feeds FOUR
    differently-pruned consumers (both self-join sides, part counts,
    the order count) — unmaterialized, column pruning defeats
    ReuseExchange and the corpus scans 3× (plan-verified), so it is
    localCheckpoint'ed (the bm25-postings class)."""
    min_support, k = int(min_support), int(k)
    op = _order_part_distinct(lineitem)
    pairs = _copurchase_pairs(op, min_support)
    pc = op.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    n = op.agg(
        F.count_distinct(F.col("l_orderkey")).cast("long").alias("_N")
    )
    scored = (
        pairs.join(
            pc.select(F.col("l_partkey").alias("part_a"), F.col("_c").alias("_ca")),
            "part_a",
        )
        .join(
            pc.select(F.col("l_partkey").alias("part_b"), F.col("_c").alias("_cb")),
            "part_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_both",
            round6(
                (F.col("n_both") * F.col("_N")).cast("double")
                / (F.col("_ca") * F.col("_cb")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), "part_a", "part_b"
    ).limit(k)


def basket_part_pairs_sql(
    min_support: int = BASKET_MIN_SUPPORT, k: int = BASKET_TOPK
) -> str:
    min_support, k = int(min_support), int(k)
    return f"""
WITH {_basket_ctes(min_support)},
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS N FROM op)
SELECT part_a, part_b, n_both,
       ROUND(CAST(n_both * N AS DOUBLE) / CAST(ca.c * cb.c AS DOUBLE)
             + 1e-09, 6) AS lift
FROM pairs
JOIN pc ca ON ca.l_partkey = part_a
JOIN pc cb ON cb.l_partkey = part_b
CROSS JOIN n
ORDER BY lift DESC, part_a, part_b
LIMIT {k}
""".strip()


PART_SIM_TOPK = 5


def part_similarity(
    lineitem: DataFrame,
    min_support: int = BASKET_MIN_SUPPORT,
    k: int = PART_SIM_TOPK,
    op: DataFrame | None = None,
) -> DataFrame:
    """Item-item collaborative filtering (the Amazon item-to-item
    recommender, Linden et al.): per part, the top-``k`` co-purchased
    neighbors by COSINE over binary order-membership vectors —
    ``cos(a,b) = c(ab) / √(c(a)·c(b))`` with c = distinct co-order /
    order counts. The neighbor-list sibling of
    :func:`basket_part_pairs` (global lift leaderboard → per-item
    ranking), over the SAME shared co-purchase kernel
    (:func:`_order_part_distinct` + :func:`_copurchase_pairs` — one
    derivation, twin CTEs shared via :func:`_basket_ctes`).

    Exactness: counts are integers; the cosine is cast-to-double ×,
    √, ÷ — three correctly-rounded ops over exact inputs, identical
    expression shape both engines (the axis_visibility class), then
    round6; the per-part rank orders on the ROUNDED cosine with a
    neighbor-id tie-break — a total order. Each count is cast to
    DOUBLE BEFORE the product so c(a)·c(b) > 2^53 (possible at 10^8+
    orders) never truncates an integer product.

    Plan (100 TB): the bounded per-order self-join (fan-out ≤
    (items/order)² — the basket class), support filter BEFORE the
    count joins, part-count table joins (dimension-sized), both pair
    orientations from ONE pass via explode(array(struct)) (the
    span_coverage trick), per-part ROW_NUMBER over candidate lists
    bounded by the support filter. Output:
    (part, neighbor, n_both, cosine, rank ≤ k). ``op`` lets a
    composing caller (part_recommendations) pass the already-
    checkpointed membership table instead of re-deriving it."""
    min_support, k = int(min_support), int(k)
    if op is None:
        op = _order_part_distinct(lineitem)
    pairs = _copurchase_pairs(op, min_support)
    pc = op.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    return part_sim_from_counts(pairs, pc, k)


def part_sim_from_counts(pairs: DataFrame, pc: DataFrame, k: int) -> DataFrame:
    """The cosine neighbor-ranking kernel over (part_a, part_b,
    n_both) pair counts and (l_partkey, _c) part counts — SHARED by
    the batch :func:`part_similarity` and the maintained serving path
    (streaming/copurchase.py), so the two cannot drift."""
    scored = (
        pairs.join(
            pc.select(F.col("l_partkey").alias("part_a"), F.col("_c").alias("_ca")),
            "part_a",
        )
        .join(
            pc.select(F.col("l_partkey").alias("part_b"), F.col("_c").alias("_cb")),
            "part_b",
        )
        .select(
            "part_a",
            "part_b",
            "n_both",
            round6(
                F.col("n_both")
                / F.sqrt(
                    F.col("_ca").cast("double") * F.col("_cb").cast("double")
                )
            ).alias("cosine"),
        )
    )
    sym = scored.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("part_a").alias("part"),
                    F.col("part_b").alias("neighbor"),
                    F.col("n_both"),
                    F.col("cosine"),
                ),
                F.struct(
                    F.col("part_b").alias("part"),
                    F.col("part_a").alias("neighbor"),
                    F.col("n_both"),
                    F.col("cosine"),
                ),
            )
        ).alias("_s")
    ).select("_s.part", "_s.neighbor", "_s.n_both", "_s.cosine")
    w = Window.partitionBy("part").orderBy(
        F.col("cosine").desc(), "neighbor"
    )
    return (
        sym.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(k))
        .select("part", "neighbor", "n_both", "cosine", "rank")
    )


def _part_sim_ctes(
    min_support: int,
    op_sql: str = "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem",
) -> str:
    """Basket CTEs + scored/sym/sim_ranked — the per-item cosine
    neighbor ranking CTE text the part_similarity /
    part_recommendations / customer_similarity twins share."""
    return f"""{_basket_ctes(int(min_support), op_sql)},
scored AS (
  SELECT part_a, part_b, n_both,
         ROUND(n_both / SQRT(CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))
               + 1e-09, 6) AS cosine
  FROM pairs
  JOIN pc ca ON ca.l_partkey = part_a
  JOIN pc cb ON cb.l_partkey = part_b
),
sym AS (
  SELECT part_a AS part, part_b AS neighbor, n_both, cosine FROM scored
  UNION ALL
  SELECT part_b AS part, part_a AS neighbor, n_both, cosine FROM scored
),
sim_ranked AS (
  SELECT part, neighbor, n_both, cosine,
         ROW_NUMBER() OVER (
           PARTITION BY part ORDER BY cosine DESC, neighbor
         ) AS rank
  FROM sym
)""".strip()


def part_similarity_sql(
    min_support: int = BASKET_MIN_SUPPORT, k: int = PART_SIM_TOPK
) -> str:
    min_support, k = int(min_support), int(k)
    return f"""
WITH {_part_sim_ctes(min_support)}
SELECT part, neighbor, n_both, cosine, CAST(rank AS INT) AS rank
FROM sim_ranked WHERE rank <= {k}
""".strip()


def customer_similarity(
    lineitem: DataFrame,
    orders: DataFrame,
    min_support: int = BASKET_MIN_SUPPORT,
    k: int = PART_SIM_TOPK,
) -> DataFrame:
    """User-user CF — the co-membership kernel's SECOND domain (the
    one-kernel-many-domains pattern: star-CC runs 5 graph domains,
    PageRank 3; this kernel now runs items-by-basket AND
    customers-by-part): two customers are similar when they bought the
    same parts — cosine over binary part-membership vectors,
    ``cos(c1,c2) = |shared parts| / √(|parts c1|·|parts c2|)``. The
    domains swap roles: baskets are PARTS, members are CUSTOMERS —
    expressed by aliasing into the kernel's canonical (basket, item)
    column names, identically in the twin (shared CTE builder with an
    op_sql slot).

    Same exactness contract as :func:`part_similarity` (integer
    counts, cast-double ×, √, ÷, round6-rank total order). Fan-out
    caveat: a part bought by many customers fans out
    (customers/part)² — the hot-token class (cross_source_dups /
    dedup_containment); cap or sample hyper-popular parts at scales
    where that bites. Output: (customer, neighbor, n_both, cosine,
    rank ≤ k)."""
    min_support, k = int(min_support), int(k)
    op = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # kernel canon: basket (l_orderkey) := part, item (l_partkey)
        # := customer
        .select(
            F.col("l_partkey").alias("l_orderkey"),
            F.col("o_custkey").alias("l_partkey"),
        )
        .distinct()
        .localCheckpoint()
    )
    pairs = _copurchase_pairs(op, min_support)
    pc = op.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    return part_sim_from_counts(pairs, pc, k).select(
        F.col("part").alias("customer"),
        "neighbor",
        "n_both",
        "cosine",
        "rank",
    )


_CUST_OP_SQL = (
    "SELECT DISTINCT l.l_partkey AS l_orderkey, o.o_custkey AS l_partkey "
    "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey"
)


def customer_similarity_sql(
    min_support: int = BASKET_MIN_SUPPORT, k: int = PART_SIM_TOPK
) -> str:
    min_support, k = int(min_support), int(k)
    return f"""
WITH {_part_sim_ctes(min_support, _CUST_OP_SQL)}
SELECT part AS customer, neighbor, n_both, cosine, CAST(rank AS INT) AS rank
FROM sim_ranked WHERE rank <= {k}
""".strip()


def source_similarity(
    docs: DataFrame,
    min_support: int = BASKET_MIN_SUPPORT,
    k: int = PART_SIM_TOPK,
) -> DataFrame:
    """Source-pair vocabulary cosine — the co-membership kernel's
    THIRD domain (baskets=tokens, items=sources): two sources are
    similar when their corpora share vocabulary,
    ``cos(s1,s2) = |shared vocab| / √(|vocab s1|·|vocab s2|)`` over
    DISTINCT (token, source) membership. The third source-pair card
    beside source_overlap (k-gram containment) and
    source_kl_divergence (distributional): set cosine answers "do
    these sources write with the same words at all", the cheapest
    first look before the heavier cards. NULL sources and empty
    tokens excluded (both engines' join semantics, made explicit).

    Fan-out caveat: a token every source uses fans out (#sources)²
    per token — bounded by the SMALL source cardinality, so the hot
    side here is harmless by construction (unlike the customer
    domain). Output: (source, neighbor, n_both, cosine, rank ≤ k)."""
    from cuda_gis_smoothing_spark.functions.text import tokens_col

    min_support, k = int(min_support), int(k)
    op = (
        docs.where(F.col("source").isNotNull())
        .select(
            F.explode(tokens_col("text")).alias("l_orderkey"),
            F.col("source").alias("l_partkey"),
        )
        .where(F.col("l_orderkey") != "")
        .distinct()
        .localCheckpoint()
    )
    pairs = _copurchase_pairs(op, min_support)
    pc = op.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    return part_sim_from_counts(pairs, pc, k).select(
        F.col("part").alias("source"),
        "neighbor",
        "n_both",
        "cosine",
        "rank",
    )


_SOURCE_OP_SQL = (
    "SELECT DISTINCT t AS l_orderkey, source AS l_partkey FROM ("
    "SELECT source, unnest(list_distinct(string_split(lower(text), ' '))) AS t "
    "FROM documents WHERE source IS NOT NULL) WHERE t <> ''"
)


def source_similarity_sql(
    min_support: int = BASKET_MIN_SUPPORT, k: int = PART_SIM_TOPK
) -> str:
    min_support, k = int(min_support), int(k)
    return f"""
WITH {_part_sim_ctes(min_support, _SOURCE_OP_SQL)}
SELECT part AS source, neighbor, n_both, cosine, CAST(rank AS INT) AS rank
FROM sim_ranked WHERE rank <= {k}
""".strip()


def part_pagerank(
    lineitem: DataFrame,
    min_support: int = BASKET_MIN_SUPPORT,
    damping: float = 0.85,
    iters: int = 5,
) -> DataFrame:
    """Catalog centrality: fixed-iteration PageRank over the part
    co-purchase graph (undirected edges = part pairs co-ordered ≥
    ``min_support`` times) — the FOURTH domain for the one
    ``pagerank_rounds`` core (grid ring-1, banded embeddings, token
    co-occurrence, now co-purchase): which parts sit at the center of
    purchasing behavior, the assortment-planning complement of
    :func:`part_similarity`'s local neighbor lists. Isolated parts
    (never co-ordered above support) hold the teleport term. Output
    ``(l_partkey, pagerank)``, one row per part."""
    op = _order_part_distinct(lineitem)
    und = _copurchase_pairs(op, min_support).select("part_a", "part_b")
    edges = und.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("part_a").alias("src"), F.col("part_b").alias("dst")
                ),
                F.struct(
                    F.col("part_b").alias("src"), F.col("part_a").alias("dst")
                ),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    nodes = op.select("l_partkey").distinct()
    from cuda_gis_smoothing_spark.operators.stats import pagerank_rounds

    return pagerank_rounds(
        nodes, edges, damping, iters, id_col="l_partkey"
    )


PART_REC_TOPK = 3


def part_recommendations(
    lineitem: DataFrame,
    min_support: int = BASKET_MIN_SUPPORT,
    k_neighbors: int = PART_SIM_TOPK,
    k: int = PART_REC_TOPK,
) -> DataFrame:
    """Basket completion — the serving composite over
    :func:`part_similarity`: for each order, score every candidate
    part by the SUM of its item-item cosines to the basket's members
    (restricted to each member's top-``k_neighbors`` list, the
    standard item2item serving cut), drop candidates already in the
    basket, and keep the top-``k`` per order.

    Exactness: summing round6 cosines is a float-association hazard —
    so the score sums INTEGER MICRO-COSINES: ``round(cosine·1e6)``
    recovers the exact integer the round6 produced (both engines round
    the identical double — the multitouch_attribution integerize-the-
    sum pattern), the per-order rank total-orders on the integer score
    with a candidate-id tie-break (tie-proof), and the reported score
    is ONE division of the exact integer sum under round6.

    Plan (100 TB): the membership table derives ONCE
    (:func:`_order_part_distinct`, shared into part_similarity via
    ``op=``); basket × neighbor-list join fans out ≤ items/order ×
    k_neighbors rows per order; candidate scores hash-aggregate on
    (order, candidate); the in-basket drop is a LEFT ANTI on the same
    key; per-order ROW_NUMBER over ≤ items·k_neighbors candidates.
    Output: (l_orderkey, part, score, rank ≤ k)."""
    min_support, k_neighbors, k = int(min_support), int(k_neighbors), int(k)
    op = _order_part_distinct(lineitem)
    sim = part_similarity(
        lineitem, min_support=min_support, k=k_neighbors, op=op
    )
    return recommend_from_sim(op, sim, k)


def recommend_from_sim(op: DataFrame, sim: DataFrame, k: int) -> DataFrame:
    """The basket-completion scoring kernel over a (l_orderkey,
    l_partkey) membership table and a part_similarity-shaped neighbor
    list — SHARED by the batch :func:`part_recommendations` and the
    maintained serving path (streaming/copurchase.py): integer
    micro-cosine sums, in-basket LEFT ANTI, tie-proof per-order
    integer rank."""
    simm = sim.select(
        "part",
        "neighbor",
        F.round(F.col("cosine") * 1e6).cast("long").alias("_micro"),
    )
    cand = (
        op.join(simm, op["l_partkey"] == simm["part"])
        .groupBy("l_orderkey", "neighbor")
        .agg(F.sum("_micro").cast("long").alias("_sm"))
    )
    filt = cand.join(
        op.select("l_orderkey", F.col("l_partkey").alias("neighbor")),
        ["l_orderkey", "neighbor"],
        "left_anti",
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("_sm").desc(), "neighbor"
    )
    return (
        filt.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(k))
        .select(
            "l_orderkey",
            F.col("neighbor").alias("part"),
            round6(F.col("_sm") / F.lit(1e6)).alias("score"),
            "rank",
        )
    )


def _rec_tail_sql(
    basket_cte: str, out_id_col: str, k_neighbors: int, k: int
) -> str:
    """sim/cand/filt/rec CTEs + final select over the ``sim_ranked``
    neighbor lists and a (l_orderkey, l_partkey)-shaped basket CTE —
    the ONE completion-scoring tail the part_recommendations and
    customer_recommendations twins share (integer micro-cosine sums,
    in-basket NOT EXISTS, tie-proof per-basket integer rank)."""
    return f"""sim AS (
  SELECT part, neighbor, CAST(ROUND(cosine * 1e6) AS BIGINT) AS micro
  FROM sim_ranked WHERE rank <= {int(k_neighbors)}
),
cand AS (
  SELECT b.l_orderkey, s.neighbor, CAST(SUM(s.micro) AS BIGINT) AS sm
  FROM {basket_cte} b JOIN sim s ON s.part = b.l_partkey
  GROUP BY 1, 2
),
filt AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM {basket_cte} b2
    WHERE b2.l_orderkey = c.l_orderkey AND b2.l_partkey = c.neighbor
  )
),
rec AS (
  SELECT l_orderkey, neighbor, sm,
         ROW_NUMBER() OVER (
           PARTITION BY l_orderkey ORDER BY sm DESC, neighbor
         ) AS rank
  FROM filt
)
SELECT l_orderkey AS {out_id_col}, neighbor AS part,
       ROUND(sm / 1e6 + 1e-09, 6) AS score, CAST(rank AS INT) AS rank
FROM rec WHERE rank <= {int(k)}""".strip()


def part_recommendations_sql(
    min_support: int = BASKET_MIN_SUPPORT,
    k_neighbors: int = PART_SIM_TOPK,
    k: int = PART_REC_TOPK,
) -> str:
    min_support, k_neighbors, k = int(min_support), int(k_neighbors), int(k)
    return f"""
WITH {_part_sim_ctes(min_support)},
{_rec_tail_sql("op", "l_orderkey", k_neighbors, k)}
""".strip()


def customer_recommendations(
    lineitem: DataFrame,
    orders: DataFrame,
    min_support: int = BASKET_MIN_SUPPORT,
    k_neighbors: int = PART_SIM_TOPK,
    k: int = PART_REC_TOPK,
) -> DataFrame:
    """Per-CUSTOMER part recommendations — the canonical item2item
    serving unit (Linden et al.: similarities from ORDER co-occurrence,
    recommendations over each customer's full purchase HISTORY): the
    item-item neighbor lists of :func:`part_similarity` score every
    candidate against the customer's distinct purchased parts via the
    SHARED :func:`recommend_from_sim` kernel (integer micro-cosine
    sums, owned-part LEFT ANTI, tie-proof integer rank). Output:
    (o_custkey, part, score, rank ≤ k).

    Plan (100 TB): the sim table derives from order baskets (the
    part_similarity kernel); customer histories are one
    lineitem ⋈ orders projection; the scoring join fans out ≤
    (parts/customer) × k_neighbors rows per customer."""
    min_support, k_neighbors, k = int(min_support), int(k_neighbors), int(k)
    sim = part_similarity(lineitem, min_support=min_support, k=k_neighbors)
    hist = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # kernel canon: basket id := customer
        .select(
            F.col("o_custkey").alias("l_orderkey"), F.col("l_partkey")
        )
        .distinct()
        .localCheckpoint()  # scoring join + anti-join sides
    )
    return recommend_from_sim(hist, sim, k).select(
        F.col("l_orderkey").alias("o_custkey"), "part", "score", "rank"
    )


_CUST_HIST_SQL = (
    "SELECT DISTINCT o.o_custkey AS l_orderkey, l.l_partkey "
    "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey"
)


def customer_recommendations_sql(
    min_support: int = BASKET_MIN_SUPPORT,
    k_neighbors: int = PART_SIM_TOPK,
    k: int = PART_REC_TOPK,
) -> str:
    min_support, k_neighbors, k = int(min_support), int(k_neighbors), int(k)
    return f"""
WITH {_part_sim_ctes(min_support)},
hist AS ({_CUST_HIST_SQL}),
{_rec_tail_sql("hist", "o_custkey", k_neighbors, k)}
""".strip()


# -- round-5 close: the last three distinct TPC-H plan shapes ----------

def blocking_suppliers(
    supplier: DataFrame, lineitem: DataFrame, k: int = TOPK_DEFAULT
) -> DataFrame:
    """TPC-H Q21 shape (schema-adapted — no receipt/commit dates):
    suppliers whose lineitem was the LAST to ship in a multi-supplier
    order — the double-correlated EXISTS + NOT-EXISTS plan (every
    other star gate correlates at most once). A line of supplier s in
    order o qualifies iff another supplier participates in o (EXISTS)
    and no other supplier's line ships strictly later (NOT EXISTS).
    Output: top-k (s_suppkey, s_name, n_blocked_orders, n_lines) by
    (n_blocked_orders DESC, n_lines DESC, s_suppkey) — integer-exact.

    Spark decorrelates by hand: NOT EXISTS (other ship > mine) ⇔
    my shipdate >= max(other suppliers' shipdates), computed per order
    via the top-2 trick — max1 over per-supplier maxima with a
    min-suppkey argmax tie-break, max2 excluding the argmax; for
    supplier s the "other max" is max2 iff s IS the argmax (when a tie
    attains max1 twice, max2 == max1, so the branch is exact either
    way). All compares are timestamp equality — exact cross-engine.

    Plan (100 TB): three order-keyed hash aggregates/joins (map-side
    combined; no window, no correlated re-scan per row — the
    decorrelation is what Catalyst would do for the EXISTS pair, made
    explicit), one supplier-keyed aggregate, TakeOrderedAndProject,
    and a dimension join AFTER the k-cut (the top_customers shape).
    per_os feeds TWO differently-pruned consumers (per_o and max2) —
    unmaterialized each re-derives the lineitem scan (the
    multi-consumer class), so it is localCheckpoint'ed: plan-measured
    5 → 2 file scans in the served plan (one lineitem scan at eager
    checkpoint build + one on the qualify side; at 100 TB the
    (order, supplier) maxima ARE a stored table)."""
    k = int(k)
    ls = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    per_os = ls.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("_smax")
    ).localCheckpoint()
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n_supp"),
        F.max(F.struct(F.col("_smax"), (-F.col("l_suppkey")).alias("_negk")))
        .alias("_top"),
    ).select(
        "l_orderkey",
        "_n_supp",
        F.col("_top._smax").alias("_max1"),
        (-F.col("_top._negk")).alias("_argmax"),
    )
    max2 = (
        per_os.join(
            per_o.select("l_orderkey", "_argmax"),
            "l_orderkey",
        )
        .where(F.col("l_suppkey") != F.col("_argmax"))
        .groupBy("l_orderkey")
        .agg(F.max("_smax").alias("_max2"))
    )
    stats = per_o.join(max2, "l_orderkey", "left")
    qualified = (
        ls.join(stats, "l_orderkey")
        .where(
            (F.col("_n_supp") >= 2)
            & (
                F.col("l_shipdate")
                >= F.when(
                    F.col("l_suppkey") == F.col("_argmax"), F.col("_max2")
                ).otherwise(F.col("_max1"))
            )
        )
        .groupBy("l_suppkey")
        .agg(
            F.count_distinct(F.col("l_orderkey"))
            .cast("long")
            .alias("n_blocked_orders"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )
    return (
        qualified.orderBy(
            F.col("n_blocked_orders").desc(),
            F.col("n_lines").desc(),
            "l_suppkey",
        )
        .limit(k)
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "n_blocked_orders", "n_lines")
    )


def blocking_suppliers_sql(k: int = TOPK_DEFAULT) -> str:
    """DuckDB twin of :func:`blocking_suppliers` — the CORRELATED form
    (EXISTS + NOT EXISTS verbatim), so the twin checks the
    decorrelation, not a re-transcription of it."""
    k = int(k)
    return f"""
WITH l1 AS (
  SELECT l.l_suppkey, l.l_orderkey
  FROM lineitem l
  WHERE EXISTS (
          SELECT 1 FROM lineitem o2
          WHERE o2.l_orderkey = l.l_orderkey
            AND o2.l_suppkey <> l.l_suppkey)
    AND NOT EXISTS (
          SELECT 1 FROM lineitem o3
          WHERE o3.l_orderkey = l.l_orderkey
            AND o3.l_suppkey <> l.l_suppkey
            AND o3.l_shipdate > l.l_shipdate)
),
agg AS (
  SELECT l_suppkey,
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_blocked_orders,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM l1 GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, a.n_blocked_orders, a.n_lines
FROM agg a JOIN supplier s ON s.s_suppkey = a.l_suppkey
ORDER BY a.n_blocked_orders DESC, a.n_lines DESC, s.s_suppkey
LIMIT {k}
""".strip()


#: lapsed-customer cutoff — every fixture customer has SOME order, but
#: 29 (at sf0.01) have none on/after 1999, so the gate is non-degenerate
IDLE_CUTOFF = "1999-01-01 00:00:00"


def idle_customers(
    customer: DataFrame, orders: DataFrame, cutoff: str = IDLE_CUTOFF
) -> DataFrame:
    """TPC-H Q22 shape (schema-adapted — segment stands in for the
    phone prefix, and "never ordered" becomes "no order since the
    cutoff": every fixture customer has SOME order, so the literal Q22
    predicate would gate an empty table — the cross_source_dups
    precedent): per market segment, count and total balance of LAPSED
    customers with an above-average positive-side account balance —
    the scalar-subquery + anti-join plan (the one star shape left: a
    global aggregate gating a NOT EXISTS). The above-average compare
    is INTEGER-exact: cents·n_pos > sum_pos_cents (avg as a rational,
    never a float divide — a balance at float-noise distance from the
    mean cannot flip cross-engine). Int64 bound: max cents (~10^6) ×
    n_pos < 2^62 holds to ~4.6e15 customers.
    Output: (c_mktsegment, n_customers, total_acctbal_cents).

    Plan (100 TB): one 1-row stats aggregate attached as a broadcast
    (the audited crossJoin(broadcast(ungrouped agg)) pattern), one
    LEFT ANTI hash join on custkey with the date predicate pushed to
    the orders scan, one segment-sized aggregate."""
    cutoff = _check_cutoff(cutoff)
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    c = customer.select("c_custkey", "c_mktsegment", cents.alias("_cents"))
    stats = c.where(F.col("_cents") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("_n_pos"),
        F.coalesce(F.sum("_cents"), F.lit(0)).cast("long").alias("_sum_pos"),
    )
    rich = c.crossJoin(F.broadcast(stats)).where(
        F.col("_cents") * F.col("_n_pos") > F.col("_sum_pos")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.expr(f"TIMESTAMP_NTZ '{cutoff}'")
    ).select("o_custkey")
    idle = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("_cents").cast("long").alias("total_acctbal_cents"),
    )


def idle_customers_sql(cutoff: str = IDLE_CUTOFF) -> str:
    cutoff = _check_cutoff(cutoff)
    return f"""
WITH c AS (
  SELECT c_custkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
         CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS sum_pos
  FROM c WHERE cents > 0
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_acctbal_cents
FROM c, s
WHERE c.cents * s.n_pos > s.sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{cutoff}')
GROUP BY c_mktsegment
""".strip()


#: Q8 constants — NATION_3 sits in EUROPE on the fixture's
#: nation→region assignment (nationkey % 5 regions), so the share is
#: non-degenerate at every SF.
Q8_REGION = "EUROPE"
Q8_NATION = "NATION_3"

_NAME_RE = _re.compile(r"\A[A-Z0-9_ ]+\Z")


def _check_name(name: str) -> str:
    """Region/nation names are interpolated into both engines' SQL —
    whitelist them (the check_terms precedent)."""
    if not _NAME_RE.match(name):
        raise ValueError(f"invalid region/nation name: {name!r}")
    return name


def nation_market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    region_name: str = Q8_REGION,
    supp_nation: str = Q8_NATION,
) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's lineitem
    revenue per order year — the conditional-share-of-group plan (a
    CASE-gated sum over the SAME rows as the total, ONE join tree —
    two separate aggregates would scan the facts twice). Revenue stays
    exact scaled integers; share is one division, round6. Output:
    (o_year, n_lineitems, nation_revenue, total_revenue, share).

    Plan (100 TB): region/nation/supplier dimension hops are explicit
    broadcasts; customer ⋈ orders ⋈ lineitem shuffle on their keys;
    the region filter prunes customers BEFORE the fact joins; one
    year-sized hash aggregate."""
    region_name = _check_name(region_name)
    supp_nation = _check_name(supp_nation)
    dims = (
        F.broadcast(region.where(F.col("r_name") == region_name)
                    .select("r_regionkey"))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    cust = customer.select("c_custkey", "c_nationkey").join(
        F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey")
    )
    ords = orders.select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("int").alias("o_year")
    ).join(cust.select("c_custkey", ), F.col("o_custkey") == F.col("c_custkey"))
    supp = supplier.select("s_suppkey", "s_nationkey").join(
        F.broadcast(nation.select(
            F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("_sname")
        )),
        F.col("s_nationkey") == F.col("_snk"),
    ).select("s_suppkey", "_sname")
    li = (
        lineitem.select("l_orderkey", "l_suppkey", _rev_scaled().alias("_rev"))
        .join(ords.select("o_orderkey", "o_year"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    target = F.when(F.col("_sname") == supp_nation, F.col("_rev")).otherwise(
        F.lit(0)
    )
    return li.groupBy("o_year").agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        round6(F.sum(target) / F.lit(10_000.0)).alias("nation_revenue"),
        round6(F.sum("_rev") / F.lit(10_000.0)).alias("total_revenue"),
        round6(F.sum(target) / F.sum("_rev")).alias("share"),
    )


def nation_market_share_sql(
    region_name: str = Q8_REGION, supp_nation: str = Q8_NATION
) -> str:
    region_name = _check_name(region_name)
    supp_nation = _check_name(supp_nation)
    return f"""
SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       ROUND(SUM(CASE WHEN sn.n_name = '{supp_nation}' THEN {_REV_SCALED_SQL}
                      ELSE 0 END) / 10000.0 + 1e-09, 6) AS nation_revenue,
       ROUND(SUM({_REV_SCALED_SQL}) / 10000.0 + 1e-09, 6) AS total_revenue,
       ROUND(SUM(CASE WHEN sn.n_name = '{supp_nation}' THEN {_REV_SCALED_SQL}
                      ELSE 0 END) * 1.0
             / SUM({_REV_SCALED_SQL}) + 1e-09, 6) AS share
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = cn.n_regionkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
WHERE r.r_name = '{region_name}'
GROUP BY 1
""".strip()


# -- Q1 / Q7 / Q15: the last TPC-H shapes expressible on this schema --
# (Q2/Q11/Q16/Q20 need a partsupp table the fixture doesn't carry;
#  Q12 needs l_shipmode — both documented out of scope, not stubbed.)

def _charge_scaled():
    """extendedprice*(1-discount)*(1+tax) as an exact integer at 10^6
    scale: cents x (100-disc_pct) x (100+tax_pct) — discount and tax
    both live on the 2-dp grid (fixture-verified; ROUND recovers the
    integer percent from the double representation). Integer bound:
    10^7 cents x 10^4 = 10^11 per row, so sums stay < 2^62 up to ~4e7
    rows PER GROUP x 10^3 groups — beyond that use decimal(38,4) sums
    (the _rev_scaled note)."""
    return (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        * (100 + F.round(F.col("l_tax") * 100).cast("long"))
    )


_CHARGE_SCALED_SQL = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
    " * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))"
)


def pricing_summary(lineitem: DataFrame, cutoff: str = SHIP_CUTOFF) -> DataFrame:
    """TPC-H Q1 shape: the canonical pushed-filter scan + wide
    multi-aggregate — one pass, ~6 groups, every measure from the same
    rows. All sums are exact scaled integers (quantity/price cents,
    disc/charge on the percent grids), averages are one division each,
    round6. Output: (l_returnflag, l_linestatus, sum_qty,
    sum_base_price, sum_disc_price, sum_charge, avg_qty, avg_price,
    avg_disc, count_order).

    Plan (100 TB): the shipdate filter and the 5-column projection
    push into the parquet scan; partial (map-side) aggregation makes
    the shuffle 6 rows per task — the query is scan-bound by
    construction, the shape AQE cannot improve."""
    cutoff = _check_cutoff(cutoff)
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_p = F.round(F.col("l_discount") * 100).cast("long")
    rows = lineitem.where(
        F.col("l_shipdate") <= F.expr(f"TIMESTAMP_NTZ '{cutoff}'")
    ).select(
        "l_returnflag",
        "l_linestatus",
        qty_c.alias("_q"),
        price_c.alias("_p"),
        disc_p.alias("_d"),
        _rev_scaled().alias("_rev"),
        _charge_scaled().alias("_chg"),
    )
    cnt = F.count(F.lit(1))
    return rows.groupBy("l_returnflag", "l_linestatus").agg(
        round6(F.sum("_q") / F.lit(100.0)).alias("sum_qty"),
        round6(F.sum("_p") / F.lit(100.0)).alias("sum_base_price"),
        round6(F.sum("_rev") / F.lit(10_000.0)).alias("sum_disc_price"),
        round6(F.sum("_chg") / F.lit(1_000_000.0)).alias("sum_charge"),
        round6(F.sum("_q") / (cnt * F.lit(100.0))).alias("avg_qty"),
        round6(F.sum("_p") / (cnt * F.lit(100.0))).alias("avg_price"),
        round6(F.sum("_d") / (cnt * F.lit(100.0))).alias("avg_disc"),
        cnt.cast("long").alias("count_order"),
    )


def pricing_summary_sql(cutoff: str = SHIP_CUTOFF) -> str:
    cutoff = _check_cutoff(cutoff)
    q = "SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))"
    p = "SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))"
    d = "SUM(CAST(ROUND(l_discount * 100) AS BIGINT))"
    return f"""
SELECT l_returnflag, l_linestatus,
       ROUND({q} / 100.0 + 1e-09, 6) AS sum_qty,
       ROUND({p} / 100.0 + 1e-09, 6) AS sum_base_price,
       ROUND(SUM({_REV_SCALED_SQL}) / 10000.0 + 1e-09, 6) AS sum_disc_price,
       ROUND(SUM({_CHARGE_SCALED_SQL}) / 1000000.0 + 1e-09, 6) AS sum_charge,
       ROUND({q} / (COUNT(*) * 100.0) + 1e-09, 6) AS avg_qty,
       ROUND({p} / (COUNT(*) * 100.0) + 1e-09, 6) AS avg_price,
       ROUND({d} / (COUNT(*) * 100.0) + 1e-09, 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{cutoff}'
GROUP BY l_returnflag, l_linestatus
""".strip()


def volume_shipping(
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nations: tuple | None = None,
) -> DataFrame:
    """TPC-H Q7 shape: cross-nation shipping volume — lineitem revenue
    per (supp_nation, cust_nation, year) where the two nations differ.
    The FULL matrix by default (the gate form: at sf0.001 only 10
    suppliers exist so any fixed nation pair can be degenerate); pass
    a 2-tuple of nation names for the classic disjunctive two-nation
    Q7 (both directions kept, same-nation dropped). Output:
    (supp_nation, cust_nation, l_year, n_lineitems, revenue).

    Plan (100 TB): nation is a broadcast hop on BOTH dimension paths;
    with a nation pair the supplier/customer filters prune the fact
    joins' build sides; customer ⋈ orders ⋈ lineitem shuffle on their
    keys; the supplier map is a broadcast; one (25x24xyears)-group
    hash aggregate with map-side partials."""
    n_s = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
        )
    )
    n_c = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
        )
    )
    supp = supplier.select("s_suppkey", "s_nationkey").join(
        n_s, F.col("s_nationkey") == F.col("_snk")
    ).select("s_suppkey", "supp_nation")
    cust = customer.select("c_custkey", "c_nationkey").join(
        n_c, F.col("c_nationkey") == F.col("_cnk")
    ).select("c_custkey", "cust_nation")
    if nations is not None:
        a, b = (_check_name(n) for n in nations)
        supp = supp.where(F.col("supp_nation").isin(a, b))
        cust = cust.where(F.col("cust_nation").isin(a, b))
    ords = orders.select("o_orderkey", "o_custkey").join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    )
    li = (
        lineitem.select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").cast("int").alias("l_year"),
            _rev_scaled().alias("_rev"),
        )
        .join(ords.select("o_orderkey", "cust_nation"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return li.groupBy("supp_nation", "cust_nation", "l_year").agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        round6(F.sum("_rev") / F.lit(10_000.0)).alias("revenue"),
    )


def volume_shipping_sql(nations: tuple | None = None) -> str:
    pred = ""
    if nations is not None:
        a, b = (_check_name(n) for n in nations)
        pred = (
            f"  AND sn.n_name IN ('{a}', '{b}')\n"
            f"  AND cn.n_name IN ('{a}', '{b}')\n"
        )
    return f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       ROUND(SUM({_REV_SCALED_SQL}) / 10000.0 + 1e-09, 6) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
WHERE sn.n_name <> cn.n_name
{pred}GROUP BY 1, 2, 3
""".strip()


#: Q15 quarter — fixture shipdates span 1995-2001; every SF has
#: suppliers with 1997-Q1 revenue (sf0.001 verified: all 10).
Q15_START = "1997-01-01 00:00:00"
Q15_END = "1997-04-01 00:00:00"


def top_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    start: str = Q15_START,
    end: str = Q15_END,
) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with MAXIMUM revenue in a date
    window — the scalar-subquery-on-an-aggregate plan, ties kept. The
    max compare runs on the EXACT scaled-integer revenue (never the
    round6 double — a float compare at the max boundary could split a
    true tie). Output: (s_suppkey, s_name, n_lineitems, total_revenue).

    Plan (100 TB): one date-filtered scan + supplier-keyed aggregate;
    the max folds in an UNPARTITIONED window over the supplier-sized
    agg (bounded by #suppliers — the source_mixture_weights precedent;
    a second max aggregate would re-scan the facts); the winners
    (ties only) broadcast into the supplier dimension join."""
    start, end = _check_cutoff(start), _check_cutoff(end)
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.expr(f"TIMESTAMP_NTZ '{start}'"))
            & (F.col("l_shipdate") < F.expr(f"TIMESTAMP_NTZ '{end}'"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum(_rev_scaled()).alias("_r"),
        )
    )
    winners = (
        rev.withColumn("_mx", F.max("_r").over(Window.partitionBy()))
        .where(F.col("_r") == F.col("_mx"))
        .select("l_suppkey", "n_lineitems", "_r")
    )
    return (
        supplier.select("s_suppkey", "s_name")
        .join(F.broadcast(winners), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            "n_lineitems",
            round6(F.col("_r") / F.lit(10_000.0)).alias("total_revenue"),
        )
    )


def top_supplier_sql(start: str = Q15_START, end: str = Q15_END) -> str:
    start, end = _check_cutoff(start), _check_cutoff(end)
    return f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(COUNT(*) AS BIGINT) AS n_lineitems,
         SUM({_REV_SCALED_SQL}) AS _r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{start}' AND l_shipdate < TIMESTAMP '{end}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, n_lineitems,
       ROUND(_r / 10000.0 + 1e-09, 6) AS total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE _r = (SELECT MAX(_r) FROM rev)
""".strip()


# -- Q5: local supplier volume (the one star shape still missing) --------

Q5_REGION = "EUROPE"
Q5_START = "1996-01-01 00:00:00"
Q5_END = "1998-01-01 00:00:00"


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    region_name: str = Q5_REGION,
    start: str = Q5_START,
    end: str = Q5_END,
) -> DataFrame:
    """TPC-H Q5 proper: per-nation revenue where the lineitem's
    SUPPLIER sits in the same nation as the ordering CUSTOMER — the
    canonical plan whose distinguishing feature is an equality between
    two DIMENSION attributes (s_nationkey = c_nationkey) riding a fact
    join, which ``region_revenue`` (the Q5-shaped rollup) does not
    express. Revenue stays exact scaled integers; one round6 division.
    Output: (n_name, n_lineitems, revenue) — unordered (the driver
    compare is order-insensitive; Q5's ORDER BY revenue DESC would be
    a needless global sort).

    Plan (100 TB): region->nation and supplier are broadcast dimension
    hops; the date filter prunes orders AT THE SCAN; customer ⋈ orders
    ⋈ lineitem shuffle on their keys; the local-supplier equality is
    a second predicate on the broadcast supplier join (no extra
    shuffle); final aggregate is #nations-sized."""
    region_name = _check_name(region_name)
    start, end = _check_cutoff(start), _check_cutoff(end)
    dims = (
        F.broadcast(
            region.where(F.col("r_name") == region_name).select("r_regionkey")
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = customer.select("c_custkey", "c_nationkey").join(
        F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey")
    )
    ords = (
        orders.where(
            (F.col("o_orderdate") >= F.expr(f"TIMESTAMP_NTZ '{start}'"))
            & (F.col("o_orderdate") < F.expr(f"TIMESTAMP_NTZ '{end}'"))
        )
        .select("o_orderkey", "o_custkey")
        .join(
            cust.select("c_custkey", "c_nationkey", "n_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    li = (
        lineitem.select("l_orderkey", "l_suppkey", _rev_scaled().alias("_rev"))
        .join(
            ords.select("o_orderkey", "c_nationkey", "n_name"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )
    return li.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        round6(F.sum("_rev") / F.lit(10_000.0)).alias("revenue"),
    )


def local_supplier_volume_sql(
    region_name: str = Q5_REGION, start: str = Q5_START, end: str = Q5_END
) -> str:
    region_name = _check_name(region_name)
    start, end = _check_cutoff(start), _check_cutoff(end)
    return f"""
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       ROUND(SUM({_REV_SCALED_SQL}) / 10000.0 + 1e-09, 6) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
              AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{region_name}'
  AND o.o_orderdate >= TIMESTAMP '{start}'
  AND o.o_orderdate < TIMESTAMP '{end}'
GROUP BY n.n_name
""".strip()


def integrity_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    documents: DataFrame,
    events: DataFrame,
) -> DataFrame:
    """Warehouse data-quality audit (the dbt-tests / Great-Expectations
    analog): one row per declared constraint with its violation count —
    referential integrity (LEFT ANTI == NOT EXISTS: a NULL foreign key
    never matches, so it counts as an orphan in BOTH engines),
    duplicate primary keys, NULL requireds, and range checks (NULL
    comparisons filter out identically). All counts are integers —
    tie-proof. Output ``(check_name, n_violations)``, one row per
    check regardless of data.

    Plan (100 TB): each check is an independent pruned scan + count —
    Catalyst reads only the referenced columns, the anti-joins
    broadcast the (smaller) parent key side, and the final UNION is
    rows-per-check, not rows-per-violation."""
    parts = []

    def check(name: str, count_df: DataFrame) -> None:
        parts.append(
            count_df.select(
                F.lit(name).alias("check_name"),
                F.col("_n").cast("long").alias("n_violations"),
            )
        )

    def cnt(df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("_n"))

    check(
        "customer_dup_pk",
        customer.agg(
            (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias("_n")
        ),
    )
    check(
        "orders_orphan_customer",
        cnt(
            orders.join(
                customer.select(F.col("c_custkey").alias("o_custkey")),
                "o_custkey",
                "left_anti",
            )
        ),
    )
    check(
        "lineitem_orphan_order",
        cnt(
            lineitem.join(
                orders.select(F.col("o_orderkey").alias("l_orderkey")),
                "l_orderkey",
                "left_anti",
            )
        ),
    )
    check(
        "lineitem_nonpositive_quantity",
        cnt(lineitem.where(F.col("l_quantity") <= 0)),
    )
    check(
        "lineitem_discount_range",
        cnt(
            lineitem.where(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
            )
        ),
    )
    check("orders_null_custkey", cnt(orders.where(F.col("o_custkey").isNull())))
    check("documents_null_text", cnt(documents.where(F.col("text").isNull())))
    check("events_null_user", cnt(events.where(F.col("user_id").isNull())))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


INTEGRITY_REPORT_SQL = """
SELECT 'customer_dup_pk' AS check_name,
       CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS n_violations
FROM customer
UNION ALL
SELECT 'orders_orphan_customer',
       CAST(COUNT(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_orphan_order',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem_nonpositive_quantity',
       CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE l_quantity <= 0
UNION ALL
SELECT 'lineitem_discount_range',
       CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE l_discount < 0 OR l_discount > 1
UNION ALL
SELECT 'orders_null_custkey',
       CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_custkey IS NULL
UNION ALL
SELECT 'documents_null_text',
       CAST(COUNT(*) AS BIGINT) FROM documents WHERE text IS NULL
UNION ALL
SELECT 'events_null_user',
       CAST(COUNT(*) AS BIGINT) FROM events WHERE user_id IS NULL
""".strip()


def shipping_lag_percentiles(
    lineitem: DataFrame, orders: DataFrame
) -> DataFrame:
    """Order-to-ship latency card: exact percentiles of the integer
    day lag ``l_shipdate − o_orderdate`` per order priority — the
    fulfillment-SLA question beside Q3/Q4's priority rollups. The lag
    is an INTEGER day count (both engines truncate the NTZ timestamp
    to a calendar date and difference in days — tz-free, the
    events-micros lesson), so the shared percentile kernel crosses
    engines exactly (the value_percentiles integer-dyadic argument).
    Output ``(o_orderpriority, q, lag_days)``.

    Plan (100 TB): one orderkey equi-join (orders side prunable to
    2 columns) + the kernel's per-group sort over bounded group count
    (5 priorities)."""
    from cuda_gis_smoothing_spark.operators.events import (
        PCT_QS,
        percentile_explode,
    )

    lag = lineitem.select("l_orderkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("long")
        .alias("lag_days"),
    )
    return percentile_explode(
        lag,
        "lag_days",
        PCT_QS,
        group_cols=("o_orderpriority",),
        out_value="lag_days",
    )


def shipping_lag_percentiles_sql() -> str:
    """DuckDB twin — the shared percentile twin builder over the same
    integer day-lag join."""
    from cuda_gis_smoothing_spark.operators.events import (
        PCT_QS,
        percentile_sql,
    )

    src = (
        "SELECT o.o_orderpriority, "
        "CAST(date_diff('day', CAST(o.o_orderdate AS DATE), "
        "CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag_days "
        "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey"
    )
    return percentile_sql(
        src,
        "lag_days",
        PCT_QS,
        group_cols=("o_orderpriority",),
        out_value="lag_days",
    )


#: Q16-adapted exclusion literals (shared by operator and twin)
VARIETY_EXCL_BRAND = "Brand#13"
VARIETY_EXCL_TYPE = "PROMO"


def supplier_part_variety(
    lineitem: DataFrame,
    part: DataFrame,
    excl_brand: str = VARIETY_EXCL_BRAND,
    excl_type: str = VARIETY_EXCL_TYPE,
) -> DataFrame:
    """TPC-H Q16 ADAPTED to this schema: parts/suppliers-relationship
    comes from observed lineitem shipments instead of the absent
    partsupp table — per (brand, type, size) bucket, the number of
    DISTINCT suppliers that shipped such parts, excluding one brand
    and one type (Q16's NOT-predicates). Distinct counts are exact
    integers — tie-proof; ordering is the consumer's concern (the
    driver hash is order-free). Output ``(p_brand, p_type, p_size,
    supplier_cnt)``.

    Plan (100 TB): the part dimension filters BEFORE the join
    (pushdown) and broadcasts; one partkey equi-join + one distinct
    aggregate on the bounded (brand, type, size) grid."""
    p = part.where(
        (F.col("p_brand") != excl_brand) & (F.col("p_type") != excl_type)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def supplier_part_variety_sql(
    excl_brand: str = VARIETY_EXCL_BRAND,
    excl_type: str = VARIETY_EXCL_TYPE,
) -> str:
    return f"""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> '{excl_brand}' AND p.p_type <> '{excl_type}'
GROUP BY 1, 2, 3
""".strip()


# ---------------------------------------------------------------------------
# Benford first-digit audit + revenue concentration (data-quality cards)
# ---------------------------------------------------------------------------

#: Benford expected first-digit shares log10(1 + 1/d), folded to Python
#: double literals ONCE so both engines consume the identical constant
#: (the cell_pagerank flit precedent).
import math as _math

BENFORD_PS: tuple[float, ...] = tuple(
    _math.log10(1.0 + 1.0 / d) for d in range(1, 10)
)


def value_benford(lineitem: DataFrame) -> DataFrame:
    """Benford's-law first-digit audit over extended-price cents — the
    fabricated-data / unit-mixup screen a warehouse QA card runs on
    every monetary column. Output one row per digit 1..9:
    ``(digit, n, share, expected_share, chi2_term)``; Σ chi2_term is
    the Pearson χ² against the Benford distribution (kept per-digit so
    every float on the gate is a single correctly-rounded expression
    over exact integers — no cross-engine sum-association exposure,
    unlike a one-row χ² total).

    Cross-engine contract: cents are the exact fixed-point money
    integers (module-header contract); the leading digit comes from
    CAST(bigint AS string) — integer-to-decimal-string is exact and
    identical in both engines (no float formatting). Expected shares
    are module-constant Python doubles flit()-ed into the twin.
    Zero-count digits are materialized by LEFT-joining the 9-row
    literal digit table. N rides an unpartitioned window over the
    9-row join (the source_mixture_weights one-scan lesson — a second
    aggregate consumer would re-scan the corpus).

    Plan (100 TB): one lineitem scan, map-side combine onto ≤9 digit
    groups, then constant-size (9-row) joins/windows — no second
    exchange of corpus data."""
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    counts = (
        lineitem.select(cents.alias("_c"))
        .where(F.col("_c") > 0)
        .groupBy(
            F.substring(F.col("_c").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    digits = (
        lineitem.sparkSession.range(1, 10)
        .select(F.col("id").cast("int").alias("digit"))
        .withColumn(
            "_p",
            F.element_at(
                F.array(*[F.lit(p) for p in BENFORD_PS]), F.col("digit")
            ),
        )
    )
    j = digits.join(counts, "digit", "left").select(
        "digit", "_p", F.coalesce(F.col("_n"), F.lit(0)).alias("n")
    )
    tot = F.sum("n").over(Window.partitionBy())
    e = F.col("_tot").cast("double") * F.col("_p")
    return (
        j.withColumn("_tot", tot)
        .select(
            "digit",
            "n",
            round6(F.col("n").cast("double") / F.col("_tot").cast("double")).alias(
                "share"
            ),
            round6(F.col("_p")).alias("expected_share"),
            round6(
                (F.col("n").cast("double") - e)
                * (F.col("n").cast("double") - e)
                / e
            ).alias("chi2_term"),
        )
    )


def value_benford_sql() -> str:
    """DuckDB twin of :func:`value_benford` — VALUES list carries the
    identical folded Benford literals."""
    from cuda_gis_smoothing_spark.functions.numeric import flit, round6_sql

    vals = ", ".join(
        f"({d}, {flit(p)})" for d, p in zip(range(1, 10), BENFORD_PS)
    )
    return f"""
WITH c AS (
  SELECT CAST(SUBSTR(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
         COUNT(*) AS n
  FROM (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem) WHERE cents > 0 GROUP BY 1
),
d AS (SELECT * FROM (VALUES {vals}) AS t(digit, p)),
j AS (SELECT d.digit, d.p, COALESCE(c.n, 0) AS n
      FROM d LEFT JOIN c USING (digit)),
t AS (SELECT digit, p, n, SUM(n) OVER () AS tot FROM j)
SELECT CAST(digit AS INT) AS digit,
       CAST(n AS BIGINT) AS n,
       {round6_sql("CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)")} AS share,
       {round6_sql("p")} AS expected_share,
       {round6_sql("(CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) * p)"
                   " * (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) * p)"
                   " / (CAST(tot AS DOUBLE) * p)")} AS chi2_term
FROM t
""".strip()


def revenue_concentration(orders: DataFrame) -> DataFrame:
    """Customer revenue-concentration card: gini + top-k shares of
    per-customer order totals — "do 10 whales own the book?", the
    skew question asked of revenue instead of join keys
    (:func:`key_skew_report`'s business-side sibling). Output one row:
    ``(n_customers, total_cents, gini, top1_share, top10_share,
    top100_share)``.

    Cross-engine contract: per-customer totals are exact fixed-point
    cents; ranks are DESCENDING (order by (-total, custkey) through
    the partition-parallel rank kernel) so the top-k cuts need no
    separate row count, and the gini rank-sum over descending ranks j
    is ``((n+1)·S − 2·Σ j·x) / (n·S)`` — integer numerator and
    denominator, ONE double division (tie blocks hold equal x so the
    sums are tie-permutation-invariant; a top-k boundary inside a tie
    block selects equal values either way — share identical).
    Int64 bound: needs ``n_customers · total_cents < 2^62``; beyond
    that move the multiply to double as lang_source_chi2 does.

    Plan (100 TB): one orders scan → custkey hash aggregate → bucketed
    rank kernel (no global window) → 1-row aggregate."""
    from cuda_gis_smoothing_spark.plans.partitioning import global_ranks

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = (
        orders.select(F.col("o_custkey").alias("_k"), cents.alias("_c"))
        .groupBy("_k")
        .agg(F.sum("_c").cast("long").alias("tot"))
        .withColumn("_negtot", -F.col("tot"))
    )
    ranked = global_ranks(
        per_cust, ["_negtot", "_k"], out_col="_j", boundaries="quantile"
    )
    n, s = F.count(F.lit(1)), F.sum("tot")
    gini = ((n + 1) * s - F.lit(2) * F.sum(F.col("_j") * F.col("tot"))).cast(
        "double"
    ) / (n * s).cast("double")
    share = lambda k: round6(  # noqa: E731
        F.sum(F.when(F.col("_j") <= k, F.col("tot")).otherwise(F.lit(0))).cast(
            "double"
        )
        / s.cast("double")
    )
    return ranked.agg(
        n.cast("long").alias("n_customers"),
        s.cast("long").alias("total_cents"),
        round6(gini).alias("gini"),
        share(1).alias("top1_share"),
        share(10).alias("top10_share"),
        share(100).alias("top100_share"),
    )


def revenue_concentration_sql() -> str:
    """DuckDB twin (HUGEINT-safe: integer sums cast to DOUBLE only at
    each division)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6_sql

    share = lambda k: round6_sql(  # noqa: E731
        f"CAST(SUM(CASE WHEN j <= {k} THEN tot ELSE 0 END) AS DOUBLE)"
        " / CAST(SUM(tot) AS DOUBLE)"
    )
    return f"""
WITH pc AS (
  SELECT o_custkey AS k,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS tot
  FROM orders GROUP BY 1
),
r AS (SELECT tot, ROW_NUMBER() OVER (ORDER BY tot DESC, k) AS j FROM pc)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(tot) AS BIGINT) AS total_cents,
       {round6_sql("CAST((COUNT(*) + 1) * SUM(tot) - 2 * SUM(j * tot) AS DOUBLE)"
                   " / CAST(COUNT(*) * SUM(tot) AS DOUBLE)")} AS gini,
       {share(1)} AS top1_share,
       {share(10)} AS top10_share,
       {share(100)} AS top100_share
FROM r
""".strip()


# ---------------------------------------------------------------------------
# Join-size estimation card (the sketch step before a pair join)
# ---------------------------------------------------------------------------

#: Fresh affine pair for join-size key sampling, disjoint from the
#: MinHash (MH_A/MH_B), sampling (S_A/S_B) and KMV pairs so sampled
#: keys never correlate with signature buckets or sample membership.
JS_A = 1_732_584_193
JS_B = 271_828_183
#: Inverse sampling rate: keys whose portable hash ≡ 0 (mod JS_RATE)
#: are measured exactly; the estimate scales their mass by JS_RATE.
JS_RATE = 16


def join_size_report(lineitem: DataFrame, rate: int = JS_RATE) -> DataFrame:
    """Self-equi-join output-size estimator card — the measurement a
    planner (or an engineer sizing a pair join / basket explosion)
    runs BEFORE committing to the shuffle: for each candidate key,
    the EXACT self-join size Σ cnt² next to a 1/R key-sample estimate
    R·Σ_{h(k) ≡ 0 mod R} cnt², plus the relative error — the
    accuracy-card family (kmv/cms_error_report) applied to join
    planning. Output one row per key column:
    ``(key_col, n_keys, exact_size, sampled_keys, est_size, rel_err)``.

    Cross-engine contract: the sample is the PORTABLE affine hash
    (deterministic, twin-exact — the KMV precedent; engine-private
    sampling would be ungateable); every number but rel_err is an
    exact integer, and rel_err is one correctly-rounded division.
    Int64 bound: ``JS_RATE · Σ cnt²  < 2^62`` — holds to ~10^8-row hot
    keys; beyond that the estimate belongs on a log scale anyway.

    Plan (100 TB): BOTH key columns ride ONE scan via an
    explode-of-two-structs pass (the span_coverage two-sided-union
    lesson) into a single (key_col, key) hash aggregate — map-side
    combinable; everything after is one aggregate per key column."""
    from cuda_gis_smoothing_spark.operators.dedup import MH_PRIME

    pairs = lineitem.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("l_partkey").alias("key_col"),
                    F.col("l_partkey").alias("_k"),
                ),
                F.struct(
                    F.lit("l_suppkey").alias("key_col"),
                    F.col("l_suppkey").alias("_k"),
                ),
            )
        ).alias("_e")
    ).select("_e.key_col", "_e._k")
    counts = pairs.groupBy("key_col", "_k").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    h = (F.pmod(F.col("_k"), F.lit(MH_PRIME)) * JS_A + JS_B) % MH_PRIME
    sq = F.col("cnt") * F.col("cnt")
    sampled = F.when(h % rate == 0, sq).otherwise(F.lit(0))
    est = F.lit(rate) * F.sum(sampled)
    return (
        counts.groupBy("key_col")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(sq).cast("long").alias("exact_size"),
            F.sum(F.when(h % rate == 0, 1).otherwise(0))
            .cast("long")
            .alias("sampled_keys"),
            est.cast("long").alias("est_size"),
            round6(
                F.abs(est - F.sum(sq)).cast("double")
                / F.sum(sq).cast("double")
            ).alias("rel_err"),
        )
    )


def join_size_report_sql() -> str:
    """DuckDB twin (HUGEINT-safe: integer sums cast to DOUBLE only at
    the rel_err division; the portable hash matches bit-for-bit)."""
    from cuda_gis_smoothing_spark.functions.numeric import round6_sql
    from cuda_gis_smoothing_spark.operators.dedup import MH_PRIME

    hash_expr = (
        f"(((k % {MH_PRIME} + {MH_PRIME}) % {MH_PRIME}) * {JS_A} + {JS_B})"
        f" % {MH_PRIME}"
    )
    return f"""
WITH pairs AS (
  SELECT 'l_partkey' AS key_col, l_partkey AS k FROM lineitem
  UNION ALL
  SELECT 'l_suppkey' AS key_col, l_suppkey AS k FROM lineitem
),
c AS (SELECT key_col, k, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2)
SELECT key_col,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cnt * cnt) AS BIGINT) AS exact_size,
       CAST(SUM(CASE WHEN ({hash_expr}) % {JS_RATE} = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS sampled_keys,
       CAST({JS_RATE} * SUM(CASE WHEN ({hash_expr}) % {JS_RATE} = 0
                            THEN cnt * cnt ELSE 0 END) AS BIGINT) AS est_size,
       {round6_sql(
           f"CAST(ABS({JS_RATE} * SUM(CASE WHEN ({hash_expr}) % {JS_RATE} = 0 "
           "THEN cnt * cnt ELSE 0 END) - SUM(cnt * cnt)) AS DOUBLE)"
           " / CAST(SUM(cnt * cnt) AS DOUBLE)")} AS rel_err
FROM c GROUP BY 1
""".strip()


# ---------------------------------------------------------------------------
# Winsorized / trimmed mean card (robust revenue average)
# ---------------------------------------------------------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95


def value_winsorized(orders: DataFrame) -> DataFrame:
    """Winsorized + trimmed mean card over order totals — the robust
    average a revenue dashboard quotes when whales/typos distort the
    plain mean. One row: ``(n_orders, p05, p95, n_low, n_high,
    trimmed_mean_cents, winsorized_mean_cents)``.

    Cross-engine layering (the value_outliers precedent + the
    integerize-the-sum pattern): totals become exact fixed-point
    CENTS; the p05/p95 fences come from the ONE exact-percentile
    aggregate (bit-identical doubles cross-engine), and every row
    comparison is integer-vs-that-same-double — no tie exposure. The
    winsorized sum is then decomposed so NO float accumulates over
    rows: Σ_mid cents is an exact BIGINT sum, the clamped tails enter
    as count·fence (two products), and the final value is a FIXED
    left-associated three-term expression + one division — written
    identically in both engines. Trimmed mean is one exact integer
    ratio under round6.

    Plan (100 TB): orders scan → 1-row percentile aggregate
    (broadcast) → map-side compare → final 1-row aggregate. The exact
    ungrouped percentile sorts once; the approx_percentile swap is
    the documented non-gateable alternative."""
    from cuda_gis_smoothing_spark.operators.events import (
        percentile_array_expr,
    )

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    c = orders.where(F.col("o_totalprice").isNotNull()).select(
        cents.alias("_v")
    )
    st = c.agg(percentile_array_expr("_v", (WINSOR_LO, WINSOR_HI)).alias("_p")).select(
        F.element_at("_p", 1).alias("_lo"), F.element_at("_p", 2).alias("_hi")
    )
    j = c.crossJoin(F.broadcast(st))
    mid = F.col("_v").cast("double").between(F.col("_lo"), F.col("_hi"))
    mid_sum = F.sum(F.when(mid, F.col("_v")).otherwise(F.lit(0)))
    n_mid = F.sum(F.when(mid, 1).otherwise(0))
    n_low = F.sum(F.when(F.col("_v") < F.col("_lo"), 1).otherwise(0))
    n_high = F.sum(F.when(F.col("_v") > F.col("_hi"), 1).otherwise(0))
    n = F.count(F.lit(1))
    wins = (
        mid_sum.cast("double")
        + n_low.cast("double") * F.max("_lo")
        + n_high.cast("double") * F.max("_hi")
    ) / n.cast("double")
    return j.agg(
        n.cast("long").alias("n_orders"),
        round6(F.max("_lo")).alias("p05"),
        round6(F.max("_hi")).alias("p95"),
        n_low.cast("long").alias("n_low"),
        n_high.cast("long").alias("n_high"),
        round6(
            mid_sum.cast("double")
            / F.nullif(n_mid.cast("double"), F.lit(0.0))
        ).alias("trimmed_mean_cents"),
        round6(wins).alias("winsorized_mean_cents"),
    )


def value_winsorized_sql() -> str:
    """DuckDB twin — same fence aggregate, same fixed-shape float
    tail (left-associated three-term sum, matching Spark's default
    association), HUGEINT sums cast only at each division."""
    from cuda_gis_smoothing_spark.functions.numeric import round6_sql
    from cuda_gis_smoothing_spark.operators.events import (
        quantile_cont_scalar_sql,
    )

    mid = "CAST(v AS DOUBLE) >= lo AND CAST(v AS DOUBLE) <= hi"
    mid_sum = f"CAST(SUM(CASE WHEN {mid} THEN v ELSE 0 END) AS DOUBLE)"
    n_low = "SUM(CASE WHEN v < lo THEN 1 ELSE 0 END)"
    n_high = "SUM(CASE WHEN v > hi THEN 1 ELSE 0 END)"
    wins = (
        f"({mid_sum} + CAST({n_low} AS DOUBLE) * MAX(lo)"
        f" + CAST({n_high} AS DOUBLE) * MAX(hi))"
        " / CAST(COUNT(*) AS DOUBLE)"
    )
    return f"""
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v FROM orders
  WHERE o_totalprice IS NOT NULL
),
st AS (
  SELECT {quantile_cont_scalar_sql("v", WINSOR_LO)} AS lo,
         {quantile_cont_scalar_sql("v", WINSOR_HI)} AS hi
  FROM c
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       {round6_sql("MAX(lo)")} AS p05,
       {round6_sql("MAX(hi)")} AS p95,
       CAST({n_low} AS BIGINT) AS n_low,
       CAST({n_high} AS BIGINT) AS n_high,
       {round6_sql(
           f"{mid_sum} / NULLIF(CAST(SUM(CASE WHEN {mid} THEN 1 ELSE 0 END)"
           " AS DOUBLE), 0e0)")} AS trimmed_mean_cents,
       {round6_sql(wins)} AS winsorized_mean_cents
FROM c, st
""".strip()


#: RFM quartile probe fractions — shared with the events-side user_rfm
RFM_QS_ORDERS = (0.25, 0.5, 0.75)


def customer_rfm(orders: DataFrame) -> DataFrame:
    """RFM segmentation over the ORDERS book — the warehouse-side
    sibling of events.user_rfm (same house pattern: every compared
    quantity is an integer, quartile boundaries come from the exact
    percentile kernel over those SAME values, so both engines compare
    identical doubles): per customer, Recency = days between the
    corpus's last order date and the customer's last order (integer
    DATE difference), Frequency = order count, Monetary = exact
    fixed-point cents sum. Scores 1–4 per axis (recency inverted),
    segment = r·100 + f·10 + m. Customers are those WITH orders (the
    table derives from orders alone — Q22 probing showed every fixture
    customer orders, and a no-order customer has no RFM row by
    definition in both engines).

    Plan (100 TB): one orders scan → custkey hash aggregate → one
    1-row quartile aggregate broadcast back. No windows."""
    from cuda_gis_smoothing_spark.operators.events import (
        percentile_array_expr,
        rfm_axis_score,
    )

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    mx = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("_mx"))
    m = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.min(F.datediff(F.col("_mx"), F.col("o_orderdate").cast("date")))
            .cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(cents).cast("long").alias("monetary_cents"),
        )
        .localCheckpoint()  # feeds the quartile aggregate AND the scoring
    )
    qs = m.agg(
        percentile_array_expr("recency_days", RFM_QS_ORDERS).alias("_qr"),
        percentile_array_expr("frequency", RFM_QS_ORDERS).alias("_qf"),
        percentile_array_expr("monetary_cents", RFM_QS_ORDERS).alias("_qm"),
    )

    asc = rfm_axis_score  # the ONE shared 1-4 scorer (NULL-guarded)
    return m.crossJoin(F.broadcast(qs)).select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        (F.lit(5) - asc("recency_days", "_qr")).cast("int").alias("r_score"),
        asc("frequency", "_qf").cast("int").alias("f_score"),
        asc("monetary_cents", "_qm").cast("int").alias("m_score"),
        (
            (F.lit(5) - asc("recency_days", "_qr")) * 100
            + asc("frequency", "_qf") * 10
            + asc("monetary_cents", "_qm")
        )
        .cast("int")
        .alias("segment"),
    )


def customer_rfm_sql() -> str:
    """DuckDB twin of :func:`customer_rfm` — integer recency days via
    date_diff, exact-cents monetary, quantile_cont over the SAME
    integers (bit-identical boundaries, the value_percentiles
    lesson)."""
    from cuda_gis_smoothing_spark.operators.events import rfm_axis_score_sql

    qs = ", ".join(str(q) for q in RFM_QS_ORDERS)
    cmp = rfm_axis_score_sql
    return f"""
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mx FROM orders),
m AS (
  SELECT o_custkey AS custkey,
         CAST(MIN(date_diff('day', CAST(o_orderdate AS DATE), mx.mx)) AS BIGINT)
           AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders, mx
  GROUP BY o_custkey
),
q AS (
  SELECT quantile_cont(recency_days, [{qs}]) AS qr,
         quantile_cont(frequency, [{qs}]) AS qf,
         quantile_cont(monetary_cents, [{qs}]) AS qm
  FROM m
),
s AS (
  SELECT custkey, recency_days, frequency, monetary_cents,
         CAST(5 - (1 + {cmp("recency_days", "qr")}) AS INT) AS r_score,
         CAST(1 + {cmp("frequency", "qf")} AS INT) AS f_score,
         CAST(1 + {cmp("monetary_cents", "qm")} AS INT) AS m_score
  FROM m, q
)
SELECT custkey, recency_days, frequency, monetary_cents,
       r_score, f_score, m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment
FROM s
""".strip()


def cohort_revenue(orders: DataFrame) -> DataFrame:
    """Monthly revenue cohorts over the orders book — the warehouse
    sibling of events.cohort_retention, with REVENUE instead of
    presence: customers bucketed by their first-order month, revenue
    and distinct-buyer counts per (cohort, months-since-first). Month
    ids are EPOCH-ANCHORED integers ``year·12 + (month−1)`` from the
    DATE-truncated NTZ timestamp — engine month-diff functions disagree
    on boundary conventions, the extracted-integer form cannot (the
    events_seasonality calendar-integerize lesson). Revenue is exact
    fixed-point cents. Output ``(cohort_ym, month_idx, n_customers,
    revenue_cents)`` — all integers, tie-proof.

    Plan (100 TB): one custkey hash aggregate (first month), one
    broadcast-or-shuffle equi-join back, one (cohort, idx) aggregate."""
    ym = (
        F.year(F.col("o_orderdate").cast("date")) * 12
        + F.month(F.col("o_orderdate").cast("date"))
        - 1
    ).cast("long")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    o = orders.select(
        F.col("o_custkey").alias("custkey"), ym.alias("_ym"), cents.alias("_c")
    ).localCheckpoint()  # first-month aggregate + the join back
    first = o.groupBy("custkey").agg(F.min("_ym").alias("cohort_ym"))
    return (
        o.join(first, "custkey")
        .groupBy("cohort_ym", (F.col("_ym") - F.col("cohort_ym")).alias("month_idx"))
        .agg(
            F.count_distinct(F.col("custkey")).cast("long").alias("n_customers"),
            F.sum("_c").cast("long").alias("revenue_cents"),
        )
    )


COHORT_REVENUE_SQL = """
WITH o AS (
  SELECT o_custkey AS custkey,
         CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) * 12
              + EXTRACT(MONTH FROM CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS ym,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
first AS (SELECT custkey, MIN(ym) AS cohort_ym FROM o GROUP BY custkey)
SELECT f.cohort_ym,
       CAST(o.ym - f.cohort_ym AS BIGINT) AS month_idx,
       CAST(COUNT(DISTINCT o.custkey) AS BIGINT) AS n_customers,
       CAST(SUM(o.c) AS BIGINT) AS revenue_cents
FROM o JOIN first f USING (custkey)
GROUP BY 1, 2
""".strip()


def order_gap_days(orders: DataFrame) -> DataFrame:
    """Inter-order interval card: exact percentiles of the integer day
    gap between a customer's consecutive orders — the
    event_interarrival question asked of the purchase cycle (churn
    models key on it). Gaps come from LAG over the per-customer
    ``(order date, orderkey)`` TOTAL order (the tie-break makes the
    window deterministic cross-engine); day differences are integers,
    so the shared percentile kernel crosses engines exactly. Customers
    with one order contribute no gap. Output ``(q, gap_days)``.

    Plan (100 TB): one custkey-partitioned window + the percentile
    kernel's single ungrouped aggregate."""
    from pyspark.sql import Window

    from cuda_gis_smoothing_spark.operators.events import (
        PCT_QS,
        percentile_explode,
    )

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("_d"), F.col("o_orderkey")
    )
    d = orders.select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("_d")
    )
    gaps = d.select(
        F.datediff(F.col("_d"), F.lag("_d").over(w)).cast("long").alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    return percentile_explode(gaps, "gap_days", PCT_QS, out_value="gap_days")


def order_gap_days_sql() -> str:
    from cuda_gis_smoothing_spark.operators.events import PCT_QS, percentile_sql

    src = (
        "SELECT CAST(date_diff('day', prev_d, d) AS BIGINT) AS gap_days FROM ("
        "SELECT CAST(o_orderdate AS DATE) AS d, "
        "LAG(CAST(o_orderdate AS DATE)) OVER ("
        "PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey"
        ") AS prev_d FROM orders) WHERE prev_d IS NOT NULL"
    )
    return percentile_sql(src, "gap_days", PCT_QS, out_value="gap_days")


_PART_LIKE_RE = _re.compile(r"\A[a-z0-9%# -]+\Z")
NATION_PROFIT_COST_PCT = 80


def _check_like(pat: str) -> str:
    """LIKE pattern interpolated into SQL on both sides — restrict to
    lowercase word characters + %/space (the check_terms precedent)."""
    if not _PART_LIKE_RE.match(pat):
        raise ValueError(f"unsupported LIKE pattern: {pat!r}")
    return pat


def nation_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    part_like: str = "%widget%",
    cost_pct: int = NATION_PROFIT_COST_PCT,
) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year),
    adapted to this schema: no partsupp table, so unit cost is
    ``cost_pct``% of ``p_retailprice`` (the one part-level price the
    schema carries) — profit per lineitem is
    revenue − cost_pct% · retailprice · quantity, rolled up per
    (supplier nation, order year) over parts matching ``part_like``
    (Q9's p_name LIKE filter). The LAST canonical TPC-H join topology
    this schema can express: the five-table star with TWO fact-side
    keys (part + supplier on lineitem) AND the order-date dimension.

    Exactness: the profit sum is an exact 10^4-scaled integer —
    revenue via the shared ``_rev_scaled`` (cents × remaining-percent)
    minus retail-cents × integer quantity × integer cost percent — so
    association order cannot matter; ONE division under round6 at the
    end. Year via F.year on NTZ midnights (the nation_market_share
    precedent). DuckDB SUM(BIGINT) → HUGEINT is cast back before the
    divide. Output: (n_name, o_year, n_lineitems, profit).

    Plan (100 TB): filtered part broadcast into the lineitem scan
    (the LIKE filter prunes before the join), supplier/nation
    broadcast, ONE shuffle join on the order key against the
    date-projected orders, then a (nation × year)-sized hash
    aggregate with map-side partials."""
    from cuda_gis_smoothing_spark.functions.numeric import round6

    part_like, cost_pct = _check_like(part_like), int(cost_pct)
    p = part.where(F.col("p_name").like(part_like)).select(
        "p_partkey", "p_retailprice"
    )
    li = lineitem.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    profit_scaled = _rev_scaled() - (
        F.round(F.col("p_retailprice") * 100).cast("long")
        * F.round(F.col("l_quantity")).cast("long")
        * F.lit(cost_pct)
    )
    j = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    return (
        j.groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum(profit_scaled).alias("_p"),
        )
        .select(
            "n_name",
            "o_year",
            "n_lineitems",
            round6(F.col("_p") / F.lit(10_000.0)).alias("profit"),
        )
    )


def nation_profit_sql(
    part_like: str = "%widget%", cost_pct: int = NATION_PROFIT_COST_PCT
) -> str:
    part_like, cost_pct = _check_like(part_like), int(cost_pct)
    return f"""
SELECT n.n_name, CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       ROUND(CAST(SUM({_REV_SCALED_SQL}
             - CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
               * CAST(ROUND(l_quantity) AS BIGINT) * {cost_pct}) AS BIGINT)
             / 1e4 + 1e-09, 6) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '{part_like}'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
""".strip()


def waiting_suppliers(
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    grace_us: int = LATE_SHIP_GRACE_US,
    k: int = TOPK_DEFAULT,
) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    this schema's shipdate lateness contract (reference semantics:
    shipped more than the grace period after the order date — the
    late_shipment_priority predicate): top-k suppliers by the number
    of multi-supplier orders where THEY were the only late supplier.
    This is the TRUE Q21 predicate shape (sole-LATE supplier — Q21's
    receipt>commit lateness mapped onto this schema's grace-period
    contract); :func:`blocking_suppliers` is the sibling adaptation
    (sole LAST-to-ship supplier, no lateness notion). Both exercise
    the EXISTS + NOT EXISTS double correlation, decorrelated
    differently: blocking needs the top-2/argmax trick (a MAX compare
    against the other suppliers), while the boolean late flag here
    reduces to two counts.

    Spark-first form: the double correlation is DECORRELATED into one
    per-(order, supplier) aggregate + one per-order aggregate — a
    supplier waits on order o iff it is late in o, o has ≥ 2 distinct
    suppliers (the EXISTS), and o has exactly ONE late supplier (the
    NOT EXISTS). The DuckDB twin keeps the canonical correlated
    EXISTS/NOT EXISTS form, so the gate proves the decorrelation —
    exactly what a 100 TB engine must do (two correlated semi/anti
    joins over lineitem become ONE shuffle on the order key).

    Exactness: lateness is exact integer microseconds (NTZ
    timestampdiff), counts are integers, and the top-k cut is a total
    order (numwait DESC, s_suppkey ASC) — tie-proof. Output:
    (s_suppkey, s_name, numwait).

    Plan (100 TB): one orders ⋈ lineitem hash join on the order key,
    two map-side-combined aggregates REUSING that partitioning, one
    small self-join on the order key, broadcast supplier dimension,
    TakeOrderedAndProject top-k."""
    o = orders.select("o_orderkey", "o_orderdate")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    tagged = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.expr("timestampdiff(MICROSECOND, o_orderdate, l_shipdate)")
            > F.lit(int(grace_us))
        )
        .cast("int")
        .alias("_late"),
    )
    # per_so feeds TWO differently-pruned consumers (per_o and the
    # waiting filter) — unmaterialized, each re-runs the orders ⋈
    # lineitem join (plan-measured 2 lineitem scans); the
    # blocking_suppliers per_os class, same fix
    per_so = (
        tagged.groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("_late").alias("_is_late"))
        .localCheckpoint()
    )
    per_o = per_so.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n_supps"), F.sum("_is_late").alias("_n_late")
    )
    waiting = per_so.where(F.col("_is_late") == 1).join(
        per_o.where((F.col("_n_supps") >= 2) & (F.col("_n_late") == 1)),
        "l_orderkey",
    )
    cnt = waiting.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("numwait")
    )
    return (
        cnt.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(int(k))
        .select("s_suppkey", "s_name", "numwait")
    )


def waiting_suppliers_sql(
    grace_us: int = LATE_SHIP_GRACE_US, k: int = TOPK_DEFAULT
) -> str:
    grace_us, k = int(grace_us), int(k)  # interpolated below
    return f"""
WITH tagged AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CAST(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate) > {grace_us}
              AS INT) AS late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
w AS (
  SELECT DISTINCT t.l_orderkey, t.l_suppkey
  FROM tagged t
  WHERE t.late = 1
    AND EXISTS (
      SELECT 1 FROM tagged t2
      WHERE t2.l_orderkey = t.l_orderkey AND t2.l_suppkey <> t.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM tagged t3
      WHERE t3.l_orderkey = t.l_orderkey
        AND t3.l_suppkey <> t.l_suppkey AND t3.late = 1
    )
)
SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
GROUP BY s.s_suppkey, s.s_name
ORDER BY numwait DESC, s.s_suppkey
LIMIT {k}
""".strip()

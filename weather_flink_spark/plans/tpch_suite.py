"""TPC-H suite completion (SURVEY.md §2-C, SQL surface).

Round 1 shipped five TPC-H-shaped SQL entries (Q3/Q5/Q6/Q10/Q18 in
pipeline_extra.py / analytics_extra.py / analytics_wave4.py). This wave
completes the classic 22-query suite over the driver's reduced TPC-H
schema. The reference engine has no SQL surface at all (its pom.xml
declares no flink-table dependency and its plan body is empty —
/root/reference/src/main/java/com/weather/flink/weather/WeatherProcessingJobPlan.java:9-11),
so like the round-1 SQL entries these are north-star capability, graded
against the DuckDB oracle running the *identical* SQL text.

Schema adaptations (TESTDATA.md tables lack partsupp, l_commitdate /
l_receiptdate / l_shipmode / l_shipinstruct, p_mfgr / p_container,
c_phone / c_address, o_comment / o_clerk):

- Q2  "min-cost supplier": supply cost is derived from observed sales
  (avg unit price per (part, supplier) from lineitem) instead of
  partsupp.ps_supplycost. Same correlated-min + 4-dim join shape.
- Q4  "order priority checking": a line is *late* when it ships more
  than 60 days after the order date (proxy for
  l_commitdate < l_receiptdate). Same EXISTS semi-join shape.
- Q9  "product type profit": profit = revenue − qty·60%·p_retailprice
  (p_retailprice stands in for ps_supplycost). Same 5-way join +
  nation/year rollup.
- Q11 "important stock": part revenue share from one nation's
  suppliers vs a scalar threshold over the whole market (partsupp
  value → observed revenue). Same scalar-subquery-threshold shape.
- Q12 "shipping modes": l_returnflag buckets stand in for l_shipmode;
  late = shipped >30 days after order date. Same conditional-agg shape.
- Q13 "customer distribution": the excluded-comment predicate becomes
  an o_orderpriority exclusion. Same left-join histogram shape.
- Q16 "supplier counts": supplier exclusion is s_acctbal < 0 (proxy
  for the complaints LIKE filter); part-supplier pairs come from
  observed lineitem sales. Same distinct-count rollup shape.
- Q20 "excess-stock suppliers": qualifying suppliers shipped >50 units
  of PROMO parts in 1997 (agg-subquery semi-join; partsupp availqty
  → shipped volume).
- Q21 "waiting suppliers": late = shipped >60 days after order date;
  the only-late-supplier condition is computed with a per-order
  distinct-supplier rollup CTE instead of EXISTS/NOT EXISTS pairs —
  same semantics, one shuffle instead of two correlated scans, and
  the shape AQE handles best at 100 TB.
- Q22 "global sales opportunity": country code = customer nation name
  (c_phone[1:2] does not exist); idle customers have no orders on or
  after 1999-01-01.

Every money aggregate goes through exact DECIMAL(18,6) accumulation and
surfaces as DOUBLE (registry.py parity discipline), so Spark's
partition-order float summation cannot drift from DuckDB's sequential
one. Averages are decimal-sum / count in DOUBLE. All queries run
through ``spark.sql`` over registered temp views — the same text the
oracle runs — giving Catalyst the full pushdown / join-reorder /
broadcast surface; plan shape is asserted registry-wide by
tests/test_plans_scale.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# exact-decimal sum surfacing as double
def _dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> dict[str, str]:
    """Register per-query temp views; returns {logical: view} mapping."""
    out: dict[str, str] = {}
    for t in tables:
        v = f"{t}_tpch_v"
        load(spark, sf_dir, t).createOrReplaceTempView(v)
        out[t] = v
    return out


def _sql_query(name: str, body: str, tables: tuple[str, ...], doc: str, tags: tuple[str, ...]):
    """Register a shared-text SQL query: identical body on Spark + DuckDB."""

    @register(
        name,
        oracle=body.format(**{t: t for t in tables}),
        doc=doc,
        tags=tags,
    )
    def _q(spark: SparkSession, sf_dir: str, _body: str = body, _tables: tuple[str, ...] = tables) -> DataFrame:
        views = _views(spark, sf_dir, *_tables)
        return spark.sql(_body.format(**views))

    _q.__name__ = name
    return _q


# ---------------------------------------------------------------------------
# Q1 — pricing summary report
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum("l_quantity", "sum_qty")},
           {_dsum("l_extendedprice", "sum_base_price")},
           {_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM {{lineitem}}
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    ("lineitem",),
    doc=(
        "TPC-H Q1 pricing summary: single wide scan-side aggregation over "
        "the largest fact. The canonical map-side-combine workload — one "
        "shuffle of |flags×status| partial rows regardless of input size; "
        "decimal-exact money sums, averages as decimal-sum/count."
    ),
    tags=("sql", "tpch", "agg"),
)

# ---------------------------------------------------------------------------
# Q2 — min-cost supplier (supply cost derived from sales; see module doc)
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q2",
    """
    WITH supply AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               CAST(SUM(CAST(l_extendedprice / l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS supplycost
        FROM {lineitem}
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name AS nation_name,
           p.p_partkey, p.p_type, sup.supplycost
    FROM {part} p
    JOIN supply sup ON sup.partkey = p.p_partkey
    JOIN {supplier} s ON s.s_suppkey = sup.suppkey
    JOIN {nation} n ON n.n_nationkey = s.s_nationkey
    JOIN {region} r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
      AND sup.supplycost = (
          SELECT MIN(sup2.supplycost)
          FROM supply sup2
          JOIN {supplier} s2 ON s2.s_suppkey = sup2.suppkey
          JOIN {nation} n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN {region} r2 ON r2.r_regionkey = n2.n_regionkey
          WHERE sup2.partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    """,
    ("lineitem", "part", "supplier", "nation", "region"),
    doc=(
        "TPC-H Q2 min-cost supplier, supply cost derived from observed "
        "unit prices (no partsupp in schema). Correlated MIN scalar "
        "subquery per part — Catalyst de-correlates it into an aggregate "
        "+ self-join; dims (supplier/nation/region) broadcast, the only "
        "big shuffle is the supply rollup keyed on (part, supplier)."
    ),
    tags=("sql", "tpch", "join", "subquery"),
)

# ---------------------------------------------------------------------------
# Q4 — order priority checking (late-ship EXISTS; see module doc)
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q4",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM {orders} o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM {lineitem} l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    ("orders", "lineitem"),
    doc=(
        "TPC-H Q4 order-priority checking: EXISTS over the fact becomes a "
        "left-semi hash join on l_orderkey after the quarter predicate "
        "prunes the probe side; the late-ship condition (>60 days after "
        "order date) stands in for commitdate<receiptdate."
    ),
    tags=("sql", "tpch", "join", "subquery"),
)

# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q7",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {_dsum("volume", "revenue")}
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM {{supplier}} s
        JOIN {{lineitem}} l ON s.s_suppkey = l.l_suppkey
        JOIN {{orders}} o ON o.o_orderkey = l.l_orderkey
        JOIN {{customer}} c ON c.c_custkey = o.o_custkey
        JOIN {{nation}} n1 ON n1.n_nationkey = s.s_nationkey
        JOIN {{nation}} n2 ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
            OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    ("supplier", "lineitem", "orders", "customer", "nation"),
    doc=(
        "TPC-H Q7 bilateral shipping volume by year. nation appears twice "
        "(supplier side and customer side) — both broadcast; the "
        "disjunctive nation-pair predicate prunes early on both dims; the "
        "only big shuffle is lineitem⋈orders on orderkey. The nation pair "
        "is chosen to have bilateral traffic even at the sf0.001 smoke "
        "fixture so the oracle differential is never vacuously empty "
        "(round-2 ADVICE)."
    ),
    tags=("sql", "tpch", "join", "agg"),
)

# ---------------------------------------------------------------------------
# Q8 — national market share within a region for a part type
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q8",
    """
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END
                         AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM {part} p
        JOIN {lineitem} l ON l.l_partkey = p.p_partkey
        JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
        JOIN {orders} o ON o.o_orderkey = l.l_orderkey
        JOIN {customer} c ON c.c_custkey = o.o_custkey
        JOIN {nation} n1 ON n1.n_nationkey = c.c_nationkey
        JOIN {region} r ON r.r_regionkey = n1.n_regionkey
        JOIN {nation} n2 ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
    ("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
    doc=(
        "TPC-H Q8 national market share: 8-way star join where every dim "
        "side broadcasts; the selective p_type filter prunes lineitem "
        "through the part join before the orderkey shuffle. Share = "
        "conditional decimal sum / total decimal sum per year."
    ),
    tags=("sql", "tpch", "join", "agg"),
)

# ---------------------------------------------------------------------------
# Q9 — product type profit (retailprice proxy; see module doc)
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q9",
    f"""
    SELECT nation_name, o_year,
           {_dsum("amount", "sum_profit")}
    FROM (
        SELECT n.n_name AS nation_name,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                   - 0.6 * p.p_retailprice * l.l_quantity AS amount
        FROM {{part}} p
        JOIN {{lineitem}} l ON l.l_partkey = p.p_partkey
        JOIN {{supplier}} s ON s.s_suppkey = l.l_suppkey
        JOIN {{orders}} o ON o.o_orderkey = l.l_orderkey
        JOIN {{nation}} n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation_name, o_year
    """,
    ("part", "lineitem", "supplier", "orders", "nation"),
    doc=(
        "TPC-H Q9 product-type profit rolled up by supplier nation and "
        "order year; cost side is 60% of p_retailprice (no "
        "ps_supplycost). LIKE filter on the part dim prunes before the "
        "fact joins; decimal-exact signed amounts."
    ),
    tags=("sql", "tpch", "join", "agg"),
)

# ---------------------------------------------------------------------------
# Q11 — important parts by revenue share (scalar-threshold; see module doc)
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q11",
    """
    WITH natrev AS (
        SELECT l.l_partkey,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,6))) AS DOUBLE) AS part_value
        FROM {lineitem} l
        JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
        JOIN {nation} n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_3'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, part_value
    FROM natrev
    WHERE part_value > (
        SELECT 0.002 * CAST(SUM(CAST(part_value AS DECIMAL(18,6))) AS DOUBLE)
        FROM natrev)
    """,
    ("lineitem", "supplier", "nation"),
    doc=(
        "TPC-H Q11 important stock: per-part value from one nation's "
        "suppliers filtered against a scalar fraction of the market "
        "total. The CTE is evaluated once per branch; the threshold is a "
        "broadcast scalar (one-row subquery), so the filter is map-side."
    ),
    tags=("sql", "tpch", "agg", "subquery"),
)

# ---------------------------------------------------------------------------
# Q12 — shipping buckets vs priority (returnflag proxy; see module doc)
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q12",
    """
    SELECT l.l_returnflag AS ship_bucket,
           COUNT(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
           COUNT(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
               AS low_line_count
    FROM {orders} o
    JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
    ("orders", "lineitem"),
    doc=(
        "TPC-H Q12 shipping-mode priority split (returnflag buckets, "
        "late = >30 days after order date). Fact-fact equi-join on "
        "orderkey with the year predicate pushed to the orders scan; "
        "FILTER conditional counts collapse to one pass."
    ),
    tags=("sql", "tpch", "join", "agg"),
)

# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM {customer} c
        LEFT JOIN {orders} o
          ON o.o_custkey = c.c_custkey
         AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    ("customer", "orders"),
    doc=(
        "TPC-H Q13 customer distribution: left join preserving "
        "zero-order customers, two-level aggregation (per-customer count, "
        "then histogram of counts). The second rollup's key domain is "
        "tiny, so its shuffle is a few hundred partial rows."
    ),
    tags=("sql", "tpch", "join", "agg"),
)

# ---------------------------------------------------------------------------
# Q14 — promotion revenue share
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q14",
    """
    SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                        THEN l.l_extendedprice * (1 - l.l_discount)
                        ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue
    FROM {lineitem} l
    JOIN {part} p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    ("lineitem", "part"),
    doc=(
        "TPC-H Q14 promotion effect: one-month shipdate slice of "
        "lineitem broadcast-joined to part, global conditional/total "
        "decimal ratio — a single partial-aggregated pass, no wide "
        "shuffle at any scale."
    ),
    tags=("sql", "tpch", "join", "agg"),
)

# ---------------------------------------------------------------------------
# Q15 — top supplier by quarterly revenue
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q15",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
        FROM {lineitem}
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM {supplier} s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    ("lineitem", "supplier"),
    doc=(
        "TPC-H Q15 top supplier: quarterly revenue rollup (the view in "
        "the spec, a CTE here) probed by a broadcast scalar MAX. Revenue "
        "values are decimal-exact so the equality join against the max "
        "is deterministic on both engines."
    ),
    tags=("sql", "tpch", "agg", "subquery"),
)

# ---------------------------------------------------------------------------
# Q16 — supplier counts per part descriptor (see module doc)
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q16",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM {lineitem} l
    JOIN {part} p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM {supplier} WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    ("lineitem", "part", "supplier"),
    doc=(
        "TPC-H Q16 supplier counts per (brand, type, size): observed "
        "part-supplier pairs from lineitem (no partsupp), excluded "
        "suppliers = negative balance (complaints proxy) via NOT IN "
        "(null-free key → broadcast anti join); distinct count shuffles "
        "on the grouping key with partial dedup map-side."
    ),
    tags=("sql", "tpch", "agg", "join"),
)

# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q17",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               / 7.0 AS avg_yearly
    FROM {lineitem} l
    JOIN {part} p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
          SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                        / COUNT(*))
          FROM {lineitem} l2
          WHERE l2.l_partkey = p.p_partkey)
    """,
    ("lineitem", "part"),
    doc=(
        "TPC-H Q17 small-quantity revenue: correlated per-part average "
        "quantity threshold. Catalyst de-correlates into a per-part "
        "aggregate joined back on partkey; the brand filter broadcasts "
        "through the part dim before the fact shuffle. The average is "
        "decimal-sum/count so the 0.2× threshold is bit-identical on "
        "both engines."
    ),
    tags=("sql", "tpch", "agg", "subquery"),
)

# ---------------------------------------------------------------------------
# Q19 — discounted revenue, disjunctive predicates
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q19",
    f"""
    SELECT {_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM {{lineitem}} l
    JOIN {{part}} p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    ("lineitem", "part"),
    doc=(
        "TPC-H Q19 discounted revenue under a 3-arm disjunction mixing "
        "dim attributes (brand, size) and fact attributes (quantity). "
        "Catalyst extracts the common part-side disjuncts below the "
        "broadcast join; one scan each side, no shuffle beyond the "
        "scalar aggregate."
    ),
    tags=("sql", "tpch", "join", "agg"),
)

# ---------------------------------------------------------------------------
# Q20 — suppliers with excess shipped volume (see module doc)
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q20",
    """
    SELECT s.s_name, n.n_name AS nation_name
    FROM {supplier} s
    JOIN {nation} n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM {lineitem} l
        JOIN {part} p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,6))) > 50)
    """,
    ("supplier", "nation", "lineitem", "part"),
    doc=(
        "TPC-H Q20 excess-stock suppliers: IN over an aggregated "
        "subquery (shipped PROMO volume in 1997 > threshold) becomes a "
        "left-semi join against a rollup that is tiny after HAVING; "
        "nation broadcasts. Decimal HAVING threshold keeps the qualifying "
        "set identical across engines."
    ),
    tags=("sql", "tpch", "join", "subquery"),
)

# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (rollup CTE; see module doc)
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q21",
    """
    WITH order_lateness AS (
        SELECT l.l_orderkey,
               COUNT(DISTINCT l.l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                                   THEN l.l_suppkey END) AS n_late_supp
        FROM {lineitem} l
        JOIN {orders} o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY l.l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM {lineitem} l
    JOIN {orders} o ON o.o_orderkey = l.l_orderkey
    JOIN order_lateness x ON x.l_orderkey = l.l_orderkey
    JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
    WHERE o.o_orderstatus = 'F'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND x.n_supp > 1 AND x.n_late_supp = 1
    GROUP BY s.s_name
    """,
    ("lineitem", "orders", "supplier"),
    doc=(
        "TPC-H Q21 waiting suppliers: the spec's EXISTS / NOT EXISTS "
        "pair is re-expressed as one per-order distinct-supplier rollup "
        "(n_supp>1 ∧ n_late_supp=1 ⇔ another supplier exists and no "
        "other supplier was late) — identical semantics, one orderkey "
        "shuffle instead of two correlated fact scans; late = shipped "
        ">60 days after order date."
    ),
    tags=("sql", "tpch", "join", "agg"),
)

# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (nation code; see module doc)
# ---------------------------------------------------------------------------

_sql_query(
    "q_sql_tpch_q22",
    """
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS ab
        FROM {customer}
        WHERE c_acctbal > 0.0
    )
    SELECT n.n_name AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM {customer} c
    JOIN {nation} n ON n.n_nationkey = c.c_nationkey
    CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (
          SELECT 1 FROM {orders} o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY n.n_name
    """,
    ("customer", "nation", "orders"),
    doc=(
        "TPC-H Q22 global sales opportunity: above-average-balance "
        "customers (broadcast scalar avg) with no recent orders "
        "(left-anti join on the date-pruned orders scan), rolled up by "
        "nation (phone country code proxy)."
    ),
    tags=("sql", "tpch", "join", "subquery"),
)

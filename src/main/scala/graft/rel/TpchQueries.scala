package graft.rel
import graft.Pinned.PinnedOps

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** The remaining classic TPC-H plan shapes beyond q1/q3/q5/q10 (in
  * [[RelQueries]]): the pure scan-aggregate (Q6), the dim-predicate
  * ratio (Q14), the having-semi-join (Q18), and the disjunctive
  * multi-predicate join (Q19). Reference scope: tickdb's analytical
  * surface is bucket group-bys over one index (query.go:20-59);
  * these anchor the standard warehouse shapes the Spark engine adds.
  *
  * Each query's comment states the plan property that matters at
  * 100 TB; PlanSpec pins the load-bearing ones (pushed filters for
  * Q6, no fact-side shuffle before the Q18 aggregation). Money stays
  * exact via the shared decimal-sum reducer or integer cents.
  */
object TpchQueries {

  private def dsum(c: org.apache.spark.sql.Column) =
    graft.tick.Reducers.exactColumn("sum", c, c)
  private def dsumSql(e: String) = graft.tick.Reducers.exactSql("sum", e, e)

  private[graft] val defs: Map[String, QueryDef] = Map(

    // TPC-H Q6 — forecast revenue change: the purest scan shape in
    // the suite. Every predicate (date window, discount band,
    // quantity cap) is a scan-pushable conjunct and the aggregate is
    // a single partial+final sum — at 100 TB this query is I/O-bound
    // by design, and the plan must show PushedFilters on all three
    // columns plus a 3-column ReadSchema (pinned in PlanSpec). The
    // discount literals hit the same parquet doubles both engines
    // read, so BETWEEN is fp-safe here.
    "q6_agg" -> QueryDef(
      s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    },

    // TPC-H Q14 — promotion effect: what share of a month's revenue
    // came from promo parts? The fact side filters to one month
    // BEFORE the part join (scan-pushed), the part dim rides a
    // broadcast (20M parts at SF100k is still far under fact scale —
    // the dim side of this join never drives a shuffle), and the
    // CASE-filtered and total sums come out of ONE aggregate pass.
    // Share in exact ppm: both sums are integer cents, the ratio is
    // one truncating division both engines compute identically.
    "q14_join" -> QueryDef(
      """WITH j AS (
        |  SELECT CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |           AS rev_c,
        |         p_type
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00')
        |SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END)
        |         AS BIGINT) AS promo_c,
        |       CAST(SUM(rev_c) AS BIGINT) AS total_c,
        |       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END)
        |         * 1000000 // SUM(rev_c) AS BIGINT) AS promo_ppm
        |FROM j""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-06-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-07-01 00:00:00")))
      li.join(broadcast(Tables.part(s, d)), col("p_partkey") === col("l_partkey"))
        .select(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
          .as("rev_c"), col("p_type"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev_c")).otherwise(0L)).as("promo_c"),
          sum(col("rev_c")).as("total_c"))
        .select(col("promo_c"), col("total_c"),
          expr("promo_c * 1000000 div total_c").as("promo_ppm"))
    },

    // TPC-H Q18 — large-volume orders: find orders whose total
    // quantity clears a threshold, then attach order + customer
    // detail. The HAVING subquery is NOT a subquery in the plan: the
    // per-order aggregate collapses the fact to |orders| rows FIRST
    // (partial aggregation map-side, one shuffle on l_orderkey), the
    // threshold filter then cuts that to a handful of rows, and both
    // detail joins run on the tiny survivor set — orders meets it on
    // its own key, customer joins after. At 100 TB the aggregate-
    // then-filter order is the whole game: the naive IN-subquery
    // form would carry the fact through two joins before filtering.
    "q18_join" -> QueryDef(
      """WITH big AS (
        |  SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300)
        |SELECT c_custkey, c_name, o_orderkey,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_c,
        |  o_orderdate, qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY totalprice_c DESC, o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).cast("long").as("qty"))
        .where(col("qty") > 300)
      big.join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          expr("CAST(round(o_totalprice*100) AS BIGINT)").as("totalprice_c"),
          col("o_orderdate"), col("qty"))
        .orderBy(col("totalprice_c").desc, col("o_orderkey"))
        .limit(20)
    },

    // TPC-H Q19 — discounted revenue under an OR-of-ANDs predicate:
    // three (brand, size-band, quantity-band) branches. The shape
    // exists to stress disjunction handling: no single conjunct
    // filters the fact scan, but Catalyst still derives the COMMON
    // bounds (l_quantity <= 30 here) as a pushable filter, prunes
    // both scans to the referenced columns, and evaluates the
    // residual OR once per joined row inside whole-stage codegen.
    // Part rides a broadcast; revenue is decimal-exact.
    "q19_join" -> QueryDef(
      s"""SELECT ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |        AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |        AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
      val branch =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("p_partkey") === col("l_partkey"))
        .where(branch)
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
    },

    // TPC-H Q7 — volume shipping between two trading nations, by
    // direction and year. The plan property that matters: the nation
    // predicate filters the supplier and customer DIMS before either
    // fact join (a handful of suppliers/customers survive), so both
    // fact scans reduce to near-semi-joins against tiny broadcast
    // sides and the only real shuffle is orders<->lineitem. Grouping
    // lands on a years x 2 directions spine; revenue in exact cents.
    "q7_join" -> QueryDef(
      """WITH sn AS (SELECT s_suppkey, n_name AS supp_nation FROM supplier
        |            JOIN nation ON s_nationkey = n_nationkey
        |            WHERE n_name IN ('NATION_9', 'NATION_11')),
        |cn AS (SELECT c_custkey, n_name AS cust_nation FROM customer
        |       JOIN nation ON c_nationkey = n_nationkey
        |       WHERE n_name IN ('NATION_9', 'NATION_11'))
        |SELECT supp_nation, cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |    AS BIGINT) AS revenue_c
        |FROM lineitem
        |JOIN sn ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN cn ON c_custkey = o_custkey
        |WHERE supp_nation <> cust_nation
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      val nations = Seq("NATION_9", "NATION_11")
      val sn = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .where(col("n_name").isin(nations: _*))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cn = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .where(col("n_name").isin(nations: _*))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .join(broadcast(sn), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(cn), col("c_custkey") === col("o_custkey"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("revenue_c"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // TPC-H Q15 — top supplier by quarterly revenue via an =MAX
    // scalar subquery (the original's view formulation). The revenue
    // relation collapses the filtered fact to |suppliers| rows FIRST,
    // the max rides back as a broadcast-of-one-row, and only then
    // does the supplier dim join the (usually single-row) winner set
    // — the aggregate-then-probe order that keeps the fact out of
    // every dim join. Ties all surface, deterministically ordered.
    "q15_join" -> QueryDef(
      """WITH rev AS (
        |  SELECT l_suppkey AS suppkey,
        |    CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |      AS BIGINT) AS total_rev_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev_c
        |FROM supplier JOIN rev ON suppkey = s_suppkey
        |WHERE total_rev_c = (SELECT MAX(total_rev_c) FROM rev)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-04-01 00:00:00")))
        .groupBy(col("l_suppkey").as("suppkey"))
        .agg(sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("total_rev_c"))
        .pinned // read twice: winner filter + max probe
      val mx = rev.agg(max("total_rev_c").as("mx"))
      rev.crossJoin(broadcast(mx)).where(col("total_rev_c") === col("mx"))
        .join(broadcast(Tables.supplier(s, d)), col("s_suppkey") === col("suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_c"))
        .orderBy("s_suppkey")
    },

    // TPC-H Q17 — small-quantity revenue loss: lineitems of one brand
    // whose quantity sits under 20% of their part's average quantity.
    // The correlated AVG subquery decorrelates into one per-part
    // aggregate joined back to the fact — and because quantities are
    // integral, the 20% threshold becomes the EXACT integer cross-
    // multiplication 5*qty*n(part) < sum(part): no fp average, no
    // rounding ambiguity at the boundary on either engine. The brand
    // filter prunes the fact scan before the join; the per-part
    // aggregate stays unfiltered, as Q17's semantics require.
    "q17_subquery" -> QueryDef(
      """WITH pa AS (
        |  SELECT l_partkey AS pk, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS loss_c
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |JOIN pa ON pk = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND 5 * CAST(l_quantity AS BIGINT) * n < sq""".stripMargin) { (s, d) =>
      val pa = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("pk"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sq"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).where(col("p_brand") === "Brand#23")),
          col("p_partkey") === col("l_partkey"))
        .join(pa, col("pk") === col("l_partkey"))
        .where(expr("5 * CAST(l_quantity AS BIGINT) * n < sq"))
        .agg(count(lit(1)).as("n_small"),
          sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("loss_c"))
    },

    // TPC-H Q13 — customer order-count distribution: how many
    // customers placed 0, 1, 2, ... qualifying orders? The double
    // aggregation over a LEFT join (customers with no qualifying
    // orders must land in the 0 bucket, which an inner join silently
    // drops). Plan order: the orders side filters at the scan, the
    // per-customer count collapses the join output before the tiny
    // distribution aggregate — two shuffles, the second over
    // |customers| rows. The filter stands in for the original's
    // comment-pattern exclusion with an equality the scan can push.
    "q13_join" -> QueryDef(
      """WITH oc AS (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON o_custkey = c_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY 1)
        |SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM oc GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      val oc = Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_orderpriority") =!= "5-LOW"),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      oc.groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q22 — dormant high-value accounts: customers whose
    // balance beats the positive-balance average yet who never placed
    // an urgent order. The two classic decorrelations in one query:
    // the scalar AVG subquery broadcasts as one row, and the NOT
    // EXISTS becomes a left-anti join against the (scan-filtered,
    // collapsed-to-distinct) urgent-customer set. Grouped by nation
    // band; balance sums in exact cents. The original's phone-prefix
    // grouping maps to the nation key this schema carries instead.
    "q22_join" -> QueryDef(
      """WITH avg_bal AS (
        |  SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0),
        |urgent AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderpriority = '1-URGENT')
        |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS totacctbal_c
        |FROM customer, avg_bal
        |WHERE c_acctbal > a
        |  AND NOT EXISTS (SELECT 1 FROM urgent WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
      val avgBal = Tables.customer(s, d).where(col("c_acctbal") > 0)
        .agg(avg("c_acctbal").as("a"))
      val urgent = Tables.orders(s, d)
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_custkey").distinct()
      Tables.customer(s, d)
        .crossJoin(broadcast(avgBal))
        .where(col("c_acctbal") > col("a"))
        .join(urgent, col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum(expr("CAST(round(c_acctbal*100) AS BIGINT)")).as("totacctbal_c"))
        .orderBy("c_nationkey")
    },

    // TPC-H Q2 — minimum-cost supplier: for each size-15 part, the
    // EUROPE suppliers offering it at the regional minimum unit cost.
    // The schema has no partsupp, so the supplier-part cost relation
    // derives from lineitem (min observed unit price in cents) — same
    // shape, one extra aggregate. The correlated =MIN subquery
    // decorrelates into a per-part min over the REGION-FILTERED
    // supplier-part relation joined back on (part, cost=min): the
    // region filter cuts suppliers before any per-part work, supplier
    // and part dims ride broadcasts, and the only fact-sized shuffle
    // is the (part,supp) aggregate. Deterministic total order for the
    // LIMIT: every output row is a distinct (part, supplier) pair and
    // the sort covers both.
    "q2_join" -> QueryDef(
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(MIN(CAST(round(l_extendedprice * 100 / l_quantity) AS BIGINT)) AS BIGINT)
        |      AS cost_c
        |  FROM lineitem GROUP BY 1, 2),
        |rs AS (
        |  SELECT s_suppkey, s_name, CAST(round(s_acctbal*100) AS BIGINT) AS acctbal_c,
        |         n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |psr AS (SELECT * FROM ps JOIN rs ON s_suppkey = l_suppkey),
        |mn AS (SELECT l_partkey, MIN(cost_c) AS min_c FROM psr GROUP BY 1)
        |SELECT acctbal_c, s_name, n_name, p_partkey, p_name, cost_c
        |FROM psr JOIN mn USING (l_partkey)
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_size = 15 AND cost_c = min_c
        |ORDER BY 1 DESC, 3, 2, 4 LIMIT 100""".stripMargin) { (s, d) =>
      val ps = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(expr("CAST(round(l_extendedprice * 100 / l_quantity) AS BIGINT)"))
          .as("cost_c"))
      val rs = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).where(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"),
          expr("CAST(round(s_acctbal*100) AS BIGINT)").as("acctbal_c"), col("n_name"))
      val psr = ps.join(broadcast(rs), col("s_suppkey") === col("l_suppkey"))
      val mn = psr.groupBy(col("l_partkey").as("pk")).agg(min("cost_c").as("min_c"))
      psr.join(mn, col("pk") === col("l_partkey") && col("cost_c") === col("min_c"))
        .join(broadcast(Tables.part(s, d).where(col("p_size") === 15)),
          col("p_partkey") === col("l_partkey"))
        .select(col("acctbal_c"), col("s_name"), col("n_name"), col("p_partkey"),
          col("p_name"), col("cost_c"))
        .orderBy(col("acctbal_c").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },

    // TPC-H Q4 — order priority checking: orders in a quarter with at
    // least one LATE lineitem (no commit/receipt dates in this schema,
    // so late := shipped > 60 days after the order date — the same
    // correlated-EXISTS shape). The EXISTS plans as a LEFT SEMI join
    // on l_orderkey with the date comparison as a residual: the fact
    // side never duplicates orders (semi joins can't), the quarter
    // filter prunes the orders scan, and the aggregate runs over
    // |quarter orders| rows.
    "q4_exists" -> QueryDef(
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
        .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-07-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-10-01 00:00:00")))
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      o.join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q8 — national market share: NATION_3's share of AMERICA's
    // ECONOMY-part import revenue, by year. Seven joins, ONE shuffle:
    // every dim (filtered part, supplier+nation, region-filtered
    // customer+nation) broadcasts, so the plan is lineitem<->orders on
    // the order key and everything else rides the exchange-free path.
    // Share in exact ppm (integer cents, truncating div) — no fp
    // ratio to drift.
    "q8_join" -> QueryDef(
      """WITH an AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS vol_c,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_c ELSE 0 END) AS BIGINT)
        |    AS nation_c,
        |  CAST(SUM(vol_c) AS BIGINT) AS total_c,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_c ELSE 0 END) * 1000000
        |    // SUM(vol_c) AS BIGINT) AS share_ppm
        |FROM an GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val sn = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cn = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d).where(col("r_name") === "AMERICA")),
              col("n_regionkey") === col("r_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val ord = Tables.orders(s, d)
        .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).where(col("p_type") === "ECONOMY")
          .select("p_partkey")), col("p_partkey") === col("l_partkey"))
        .join(broadcast(sn), col("s_suppkey") === col("l_suppkey"))
        .join(ord, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(cn), col("c_custkey") === col("o_custkey"))
        .select(col("o_year"),
          expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)").as("vol_c"),
          col("supp_nation"))
        .groupBy("o_year")
        .agg(sum(when(col("supp_nation") === "NATION_3", col("vol_c")).otherwise(0L))
            .as("nation_c"),
          sum(col("vol_c")).as("total_c"))
        .select(col("o_year"), col("nation_c"), col("total_c"),
          expr("nation_c * 1000000 div total_c").as("share_ppm"))
        .orderBy("o_year")
    },

    // TPC-H Q9 — product type profit by supplier nation and year. No
    // partsupp supply cost in this schema: unit cost := 80% of the
    // part's retail price, so profit per lineitem is two independent
    // cent-roundings subtracted in BIGINT — exact on both engines.
    // The %widget% filter prunes the part broadcast before the fact
    // join; supplier+nation broadcast; the one shuffle is
    // lineitem<->orders (orders only contributes the year).
    "q9_join" -> QueryDef(
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |         - CAST(round(p_retailprice * 0.8 * l_quantity * 100) AS BIGINT))
        |    AS BIGINT) AS profit_c
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val sn = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).where(col("p_name").like("%widget%"))
          .select("p_partkey", "p_retailprice")), col("p_partkey") === col("l_partkey"))
        .join(broadcast(sn), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)" +
          " - CAST(round(p_retailprice * 0.8 * l_quantity * 100) AS BIGINT)"))
          .as("profit_c"))
        .orderBy("nation", "o_year")
    },

    // TPC-H Q11 — important stock: parts whose NATION_7-supplied value
    // clears a fraction of that nation's total (no partsupp — value
    // derives from lineitem revenue). The classic group-HAVING-scalar
    // shape: the per-part aggregate collapses first, the grand total
    // rides back as a broadcast-of-one-row, and the threshold is the
    // SCALE-FREE integer cross-multiplication value*nparts > 3*total
    // (i.e. value beats 3x the mean part value — a fixed fraction of
    // total would thin out as the part count grows with SF, going
    // vacuously empty at sf0.1). localCheckpoint because the
    // aggregate feeds both the winner filter and the total.
    "q11_having" -> QueryDef(
      """WITH pv AS (
        |  SELECT l_partkey AS partkey,
        |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_c
        |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_7' GROUP BY 1)
        |SELECT partkey, value_c
        |FROM pv, (SELECT SUM(value_c) AS t, COUNT(*) AS np FROM pv)
        |WHERE value_c * np > 3 * t
        |ORDER BY value_c DESC, partkey""".stripMargin) { (s, d) =>
      val n7 = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).where(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val pv = Tables.lineitem(s, d)
        .join(broadcast(n7), col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("l_partkey").as("partkey"))
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("value_c"))
        .pinned // read twice: winner filter + grand total
      val t = pv.agg(sum("value_c").as("t"), count(lit(1)).as("np"))
      pv.crossJoin(broadcast(t)).where(col("value_c") * col("np") > col("t") * 3)
        .select("partkey", "value_c")
        .orderBy(col("value_c").desc, col("partkey"))
    },

    // TPC-H Q12 — shipping-delay priority mix (no l_shipmode in this
    // schema: the grouping key becomes the shipping-delay class, same
    // CASE-sum shape). The year filter pushes to the lineitem scan,
    // the join carries only (priority, orderdate), and the high/low
    // counts come out of ONE aggregate pass over three groups.
    "q12_join" -> QueryDef(
      """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'FAST'
        |            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'NORMAL'
        |            ELSE 'SLOW' END AS ship_class,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val delay = datediff(col("l_shipdate"), col("o_orderdate"))
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .select("l_orderkey", "l_shipdate")
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(when(delay <= 30, "FAST").when(delay <= 90, "NORMAL").otherwise("SLOW")
          .as("ship_class"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
            .as("low_line_count"))
        .orderBy("ship_class")
    },

    // TPC-H Q16 — supplier diversity by part attributes, excluding
    // flagged suppliers (no comment column — negative balance stands
    // in for the complaint filter). The supplier-part relation
    // derives as DISTINCT (part,supp) from lineitem; the NOT IN is a
    // LEFT ANTI against the (tiny, broadcast) flagged set — suppkey
    // is non-nullable so the anti join IS the null-safe NOT IN here.
    // COUNT(DISTINCT) runs after the part broadcast filter, over the
    // collapsed relation, never the raw fact.
    "q16_join" -> QueryDef(
      """WITH sp AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM sp JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY 4 DESC, 1, 2, 3""".stripMargin) { (s, d) =>
      val sp = Tables.lineitem(s, d).select("l_partkey", "l_suppkey").distinct()
      val bad = Tables.supplier(s, d).where(col("s_acctbal") < 0).select("s_suppkey")
      sp.join(broadcast(bad), col("s_suppkey") === col("l_suppkey"), "left_anti")
        .join(broadcast(Tables.part(s, d)
            .where(col("p_brand") =!= "Brand#5" &&
              col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))),
          col("p_partkey") === col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // TPC-H Q20 — the nested correlated aggregate: NATION_5 suppliers
    // who DOMINATED some red part's 1997 volume (shipped more than
    // half of it — the availqty > 0.5*sum shape without partsupp).
    // Two stacked aggregates over the same year-filtered fact: per
    // (part,supp) quantities, then per-part totals, joined back so
    // the 2*sq > tq comparison is integer-exact. The part-name filter
    // broadcasts; the IN becomes a LEFT SEMI from the (tiny) supplier
    // dim against the distinct dominant-supplier set.
    "q20_nested" -> QueryDef(
      """WITH pq AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, SUM(sq) AS tq FROM pq GROUP BY 1),
        |cand AS (
        |  SELECT DISTINCT l_suppkey FROM pq JOIN pt USING (l_partkey)
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'red%' AND 2 * sq > tq)
        |SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_5' AND s_suppkey IN (SELECT l_suppkey FROM cand)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val pq = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("sq"))
        .pinned // read twice: per-part totals + dominance probe
      val pt = pq.groupBy(col("l_partkey").as("pk")).agg(sum("sq").as("tq"))
      val cand = pq.join(pt, col("pk") === col("l_partkey"))
        .join(broadcast(Tables.part(s, d).where(col("p_name").like("red%"))
          .select("p_partkey")), col("p_partkey") === col("l_partkey"))
        .where(col("sq") * 2 > col("tq"))
        .select("l_suppkey").distinct()
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).where(col("n_name") === "NATION_5")),
          col("s_nationkey") === col("n_nationkey"))
        .join(cand, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },

    // TPC-H Q21 — suppliers who kept orders waiting: the double
    // correlated EXISTS / NOT EXISTS. Late := shipped > 60 days after
    // the order date (no receipt/commit dates). The EXISTS plans as a
    // LEFT SEMI and the NOT EXISTS as a LEFT ANTI, both on the
    // l_orderkey equi-key with the supplier-inequality (and lateness)
    // as residual conditions — semi/anti joins never duplicate l1
    // rows, so COUNT(*) is exact. The only fact-sized shuffles are
    // the three l_orderkey exchanges (orders join + semi + anti); the
    // NATION_2 supplier dim broadcasts.
    "q21_exists" -> QueryDef(
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 100""".stripMargin) { (s, d) =>
      val nat2 = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).where(col("n_name") === "NATION_2")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      val l1 = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(Tables.orders(s, d).where(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("o_orderkey") === col("l_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .join(broadcast(nat2), col("s_suppkey") === col("l_suppkey"))
      val l2 = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("l2_ok"), col("l_suppkey").as("l2_sk"))
      val l3 = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("l3_ok"), col("l_suppkey").as("l3_sk"),
          col("l_shipdate").as("l3_sd"))
      l1.join(l2, col("l2_ok") === col("l_orderkey") && col("l2_sk") =!= col("l_suppkey"),
          "left_semi")
        .join(l3, col("l3_ok") === col("l_orderkey") && col("l3_sk") =!= col("l_suppkey") &&
          col("l3_sd") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_anti")
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }
  )
}

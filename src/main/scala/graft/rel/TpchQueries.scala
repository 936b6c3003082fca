package graft.rel

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
        .localCheckpoint() // read twice: winner filter + max probe
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
    }
  )
}

package graft.operators

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3).
  *
  * Reference patterns re-expressed:
  *  - star equi-join     ≙ index-table joins (models.py:107-140,
  *    collect_sample_modes.py:65-113)
  *  - left join          ≙ raw map ← adjusted windows (adjust_swaths.R:43)
  *  - interval containment ≙ peak → isolation-window tagging
  *    (msproc.py:89-91, 164-170) — broadcast nested-loop with a range
  *    predicate; the window table is tiny, so the big side streams with
  *    NO shuffle
  *  - anti join          ≙ out-of-SWATH discard (msproc.py:164-170)
  *  - semi join          ≙ membership selection (msproc.py:605-618)
  *
  * Scale notes: all dimension tables (region/nation/bands) are broadcast —
  * the fact side never shuffles for these joins. The customer⋈orders
  * semi/anti joins hash-partition on the join key; at 100 TB those would
  * be the only exchanges, and AQE converts them to broadcast when the
  * filtered build side fits.
  */
object Joins extends QueryPack {

  /** Shared by q_join_pit and its streaming twin (q_stream_pit): both
    * forms must replay to the identical enriched spine. All ordering is
    * on the µs grid (epoch_us / ts div 1000) on every side. */
  private[graft] val pitOracleSql: String = """
        WITH u AS (
          SELECT user_id, epoch_us(ts) AS t, event_id, 2 AS k,
                 NULL::DOUBLE AS va, NULL::DOUBLE AS vb
          FROM events WHERE event_type = 'click'
          UNION ALL
          SELECT user_id, epoch_us(ts), event_id, 0, value, NULL
          FROM events WHERE event_type = 'view'
          UNION ALL
          SELECT user_id, epoch_us(ts), event_id, 1, NULL, value
          FROM events WHERE event_type = 'error'),
        w AS (SELECT event_id, user_id, k,
                     last_value(va IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY t, k, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS lva,
                     last_value(vb IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY t, k, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS lvb
              FROM u)
        SELECT event_id, user_id,
               round(lva, 4) AS last_view_value,
               round(lvb, 4) AS last_error_value
        FROM w WHERE k = 2 ORDER BY event_id"""

  /** Static value-band dimension (isolation-window analog): [lo, hi). */
  private def bands(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(
      (0, 0.0, 2.0), (1, 2.0, 5.0), (2, 5.0, 10.0),
      (3, 10.0, 20.0), (4, 20.0, 1.0e18)
    ).toDF("band_id", "lo", "hi")
  }

  private val bandsSqlCte = """
    bands(band_id, lo, hi) AS (VALUES
      (0, 0.0, 2.0), (1, 2.0, 5.0), (2, 5.0, 10.0),
      (3, 10.0, 20.0), (4, 20.0, 1.0e18))"""

  val queries: Map[String, GraftQuery] = Map(

    // -------------------------------------------- interval-overlap join
    // General interval × interval overlap (the genomics / IP-range /
    // uptime-window join) via BUCKETED EQUI-JOIN: each interval explodes
    // to the fixed 32-day buckets it spans (≤ 2 here), the join is a
    // plain hash join on the bucket id, and the exact overlap predicate
    // filters after the match; a DISTINCT collapses pairs that met in
    // two buckets. At 100 TB this is the difference between a shuffle
    // hash join keyed by bucket and the O(n·m) range-predicate
    // nested-loop the naive form plans — the oracle states the naive
    // form, results are identical. Lineitem intervals are
    // [ship, ship + 1 + ⌊qty⌋ % 30 days]; windows are 30 days from each
    // low-key order's date. Days are integer epoch-days on both sides.
    "q_join_interval_overlap" -> GraftQuery(
      run = (s, d) => {
        // TIMESTAMP_NTZ → epoch-day without any timezone interpretation
        def days(c: String) =
          expr(s"CAST(datediff(CAST($c AS DATE), DATE '1970-01-01') AS BIGINT)")
        val a = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            days("l_shipdate").as("a_start"),
            expr("CAST(floor(l_quantity) AS BIGINT) % 30").as("dur"))
          .withColumn("a_end", col("a_start") + lit(1L) + col("dur"))
        val b = Tables.orders(s, d)
          .filter(col("o_custkey") < 20)
          .select(col("o_orderkey").as("b_id"),
            days("o_orderdate").as("b_start"))
          .withColumn("b_end", col("b_start") + lit(30L))
        val aB = a.withColumn("bucket",
          explode(sequence(expr("a_start div 32"), expr("a_end div 32"))))
        val bB = b.withColumn("bucket",
          explode(sequence(expr("b_start div 32"), expr("b_end div 32"))))
        aB.join(broadcast(bB), Seq("bucket"))
          .filter(col("a_start") <= col("b_end") &&
            col("b_start") <= col("a_end") &&
            // each overlapping pair meets in up to 2 buckets; count it
            // exactly once, in the bucket of its first shared day (a
            // DISTINCT would also collapse genuine duplicate fact rows)
            col("bucket") === expr("greatest(a_start, b_start) div 32"))
          .select(col("b_id"), col("l_orderkey"), col("l_linenumber"),
            (least(col("a_end"), col("b_end")) -
              greatest(col("a_start"), col("b_start")) + 1)
              .as("overlap_days"))
          .groupBy("b_id")
          .agg(count(lit(1)).as("n_overlaps"),
            sum(col("overlap_days")).as("sum_overlap_days"))
          .orderBy("b_id")
      },
      oracle = Some("""
        WITH a AS (
          SELECT l_orderkey, l_linenumber,
                 datediff('day', DATE '1970-01-01', l_shipdate::DATE) AS a_start,
                 datediff('day', DATE '1970-01-01', l_shipdate::DATE) + 1
                   + floor(l_quantity)::BIGINT % 30 AS a_end
          FROM lineitem),
        b AS (
          SELECT o_orderkey AS b_id,
                 datediff('day', DATE '1970-01-01', o_orderdate::DATE) AS b_start,
                 datediff('day', DATE '1970-01-01', o_orderdate::DATE) + 30 AS b_end
          FROM orders WHERE o_custkey < 20)
        SELECT b_id, count(*) AS n_overlaps,
               CAST(sum(least(a_end, b_end) - greatest(a_start, b_start) + 1)
                    AS BIGINT) AS sum_overlap_days
        FROM a JOIN b ON a_start <= b_end AND b_start <= a_end
        GROUP BY b_id ORDER BY b_id""")),

    // ------------------------------------------ interval-lookup rewrite
    // The SAME point-in-interval shape as q_join_range_bands, but run
    // through graft.plans.IntervalLookupJoinRule: the optimizer rewrites
    // the range join against the literal band table into a codegen'd
    // O(log W) binary-search probe — NO join operator, no broadcast
    // exchange, the scan's whole-stage-codegen loop tags each row
    // directly (the IntervalTree probe of msproc.py:89-91 as a Catalyst
    // rule). The oracle states the relational form; results are
    // bit-identical. IntervalJoinRuleSpec pins the plan shape.
    "q_join_interval_lookup" -> GraftQuery(
      run = (s, d) => {
        graft.plans.IntervalLookupJoinRule.install(s)
        Tables.events(s, d)
          .join(bands(s),
            col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy(col("band_id"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("value")), 4).as("sum_value"))
          .orderBy("band_id", "event_type")
      },
      oracle = Some(s"""
        WITH $bandsSqlCte
        SELECT band_id, event_type, count(*) AS n,
               round(sum(value), 4) AS sum_value
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band_id, event_type ORDER BY band_id, event_type""")),

    // -------------------------- interval join, DATA-DERIVED dim (physical)
    // The case the logical lookup rule CANNOT take: the band table is
    // computed from the data itself (exact quartiles of events.value), so
    // there is no literal to bake into the plan — exactly how the
    // reference's isolation windows arise (derived from the scans,
    // msproc.py:89-91). graft.plans.IntervalJoinStrategy plans the range
    // join as IntervalJoinExec: dim collected once, sorted-lo + prefix-max
    // stabbing structure broadcast, O(log W + matches) probe per fact row
    // instead of the O(W)-per-row BroadcastNestedLoopJoin default.
    // Quartile bounds round to 4 dp on BOTH sides so the band edges are
    // the identical doubles in both engines. IntervalJoinStrategySpec
    // proves result equivalence with Spark's default plan on
    // overlapping/duplicate/null/NaN intervals.
    "q_join_interval_stats_bands" -> GraftQuery(
      run = (s, d) => {
        graft.plans.IntervalJoinStrategy.install(s)
        val q = Tables.events(s, d).agg(
          round(expr("percentile(value, 0.25D)"), 4).as("q1"),
          round(expr("percentile(value, 0.5D)"), 4).as("q2"),
          round(expr("percentile(value, 0.75D)"), 4).as("q3"))
        val dim = q.select(explode(array(
            struct(lit(0).as("band_id"),
              lit(Double.NegativeInfinity).as("lo"), col("q1").as("hi")),
            struct(lit(1).as("band_id"), col("q1").as("lo"),
              col("q2").as("hi")),
            struct(lit(2).as("band_id"), col("q2").as("lo"),
              col("q3").as("hi")),
            struct(lit(3).as("band_id"), col("q3").as("lo"),
              lit(Double.PositiveInfinity).as("hi")))).as("b"))
          .select(col("b.band_id").as("band_id"), col("b.lo").as("lo"),
            col("b.hi").as("hi"))
          .hint("broadcast")
        Tables.events(s, d)
          .join(dim,
            col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy(col("band_id"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value")), 4).as("sum_value"))
          .orderBy("band_id")
      },
      oracle = Some("""
        WITH q AS (SELECT round(quantile_cont(value, 0.25), 4) AS q1,
                          round(quantile_cont(value, 0.5), 4) AS q2,
                          round(quantile_cont(value, 0.75), 4) AS q3
                   FROM events),
        bands AS (
          SELECT 0 AS band_id, CAST('-infinity' AS DOUBLE) AS lo, q1 AS hi
          FROM q
          UNION ALL SELECT 1, q1, q2 FROM q
          UNION ALL SELECT 2, q2, q3 FROM q
          UNION ALL SELECT 3, q3, CAST('infinity' AS DOUBLE) FROM q)
        SELECT band_id, count(*) AS n, round(sum(value), 4) AS sum_value
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band_id ORDER BY band_id""")),

    // Three-way star join, both dims broadcast (no shuffle on customer).
    "q_join_star" -> GraftQuery(
      run = (s, d) =>
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_cust"),
            round(sum(col("c_acctbal")), 2).as("total_bal"))
          .orderBy("r_name", "n_name"),
      oracle = Some("""
        SELECT r_name, n_name, count(*) AS n_cust,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // ----------------------------------- TPC-H Q3 shape (shipping priority)
    // Selective dim filter → fact-fact join → grouped revenue → top-k.
    // The classic Catalyst showcase: both filters reach their scans,
    // the filtered customer side broadcasts, and only the
    // orders⋈lineitem equi-join shuffles (AQE may broadcast that too).
    // Revenue rounds to 2dp BEFORE ranking so the top-k cutoff sits on
    // a stable value, with l_orderkey as the total-order tie-break.
    "q_join_tpch_q3" -> GraftQuery(
      run = (s, d) =>
        Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .join(Tables.orders(s, d)
              .filter(col("o_orderdate") < lit("1997-06-30").cast("timestamp")),
            col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, d)
              .filter(col("l_shipdate") > lit("1997-06-30").cast("timestamp")),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10),
      oracle = Some("""
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-06-30'
          AND l_shipdate > TIMESTAMP '1997-06-30'
        GROUP BY l_orderkey, orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ------------------------------ TPC-H Q5 shape (local supplier volume)
    // Six-table join through region→nation→customer→orders→lineitem→
    // supplier with the "local supplier" same-nation predicate. All
    // dimension hops broadcast; the two fact joins shuffle on their keys.
    "q_join_tpch_q5" -> GraftQuery(
      run = (s, d) =>
        Tables.region(s, d).filter(col("r_name") === "ASIA")
          .join(Tables.nation(s, d), col("r_regionkey") === col("n_regionkey"))
          .join(Tables.customer(s, d), col("n_nationkey") === col("c_nationkey"))
          .join(Tables.orders(s, d)
              .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(Tables.supplier(s, d),
            col("l_suppkey") === col("s_suppkey") &&
              col("s_nationkey") === col("c_nationkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name")),
      oracle = Some("""
        SELECT n_name,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM region
        JOIN nation ON r_regionkey = n_regionkey
        JOIN customer ON n_nationkey = c_nationkey
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // --------------------------- correlated scalar subquery (TPC-H Q17)
    // "Small-quantity orders for a brand": each lineitem row compares
    // against a PER-PART average — the canonical correlated scalar
    // subquery. The Spark side states the DECORRELATED plan explicitly
    // (what Catalyst's RewriteCorrelatedScalarSubquery produces): the
    // selective part filter is broadcast into BOTH the per-part average
    // build and the probe, so the avg aggregates only the ~1% of
    // lineitem that can ever match, and the avg join is itself
    // broadcast. l_quantity is integer-valued, so avg is an exact
    // integer ratio in both engines — the `< avg/5` comparison is
    // FP-deterministic.
    "q_join_tpch_q17" -> GraftQuery(
      run = (s, d) => {
        val parts = Tables.part(s, d)
          .filter(col("p_brand") === "Brand#4").select("p_partkey")
        val li = Tables.lineitem(s, d)
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        val avgQ = li.groupBy(col("l_partkey").as("a_partkey"))
          .agg(avg(col("l_quantity")).as("avg_qty"))
        li.join(broadcast(avgQ), col("l_partkey") === col("a_partkey"))
          .filter(col("l_quantity") < col("avg_qty") / 5.0)
          .agg(round(sum(col("l_extendedprice")) / 7.0, 4).as("avg_yearly"))
      },
      oracle = Some("""
        SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#4'
          AND l_quantity < (SELECT avg(l_quantity) / 5.0 FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)""")),

    // ------------------------ IN-subquery over an aggregate (TPC-H Q18)
    // "Large-volume customers": orders whose lineitem quantity total
    // clears a threshold, rejoined to their lineitems — the
    // HAVING + IN-subquery shape. The Spark form is the decorrelated
    // one: the qualifying-order set (tiny after HAVING) broadcasts as a
    // semi-join filter, so the big fact side shuffles once for its own
    // aggregate and never for the membership test. sum(l_quantity) is
    // integer-exact in any accumulation order.
    "q_join_tpch_q18" -> GraftQuery(
      run = (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity")).as("tot_qty"))
          .filter(col("tot_qty") > 300.0)
          .select("l_orderkey")
        Tables.lineitem(s, d)
          .join(broadcast(big), "l_orderkey")
          .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("o_orderkey"),
            col("o_totalprice"))
          .agg(sum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
      },
      oracle = Some("""
        SELECT c_custkey, o_orderkey, o_totalprice,
               sum(l_quantity) AS sum_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING sum(l_quantity) > 300.0)
        GROUP BY c_custkey, o_orderkey, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")),

    // Left outer join keeping unmatched dimension rows.
    "q_join_left" -> GraftQuery(
      run = (s, d) =>
        Tables.nation(s, d)
          .join(Tables.customer(s, d),
            col("n_nationkey") === col("c_nationkey"), "left")
          .groupBy(col("n_name"))
          .agg(count(col("c_custkey")).as("n_cust"))
          .orderBy("n_name"),
      oracle = Some("""
        SELECT n_name, count(c_custkey) AS n_cust
        FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // Interval-containment join: point value into [lo, hi) bands.
    // Broadcast nested-loop — the fact table streams unshuffled.
    "q_join_range_bands" -> GraftQuery(
      run = (s, d) =>
        Tables.events(s, d)
          .join(broadcast(bands(s)),
            col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy(col("band_id"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("value")), 4).as("sum_value"))
          .orderBy("band_id"),
      oracle = Some(s"""
        WITH $bandsSqlCte
        SELECT band_id, count(*) AS n, round(sum(value), 4) AS sum_value
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band_id ORDER BY band_id""")),

    // Semi join: customers having at least one large order (EXISTS).
    "q_join_semi" -> GraftQuery(
      run = (s, d) =>
        Tables.customer(s, d)
          .join(
            Tables.orders(s, d).filter(col("o_totalprice") > 100000.0),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey"),
      oracle = Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        ORDER BY c_custkey""")),

    // Anti join: customers with no orders at all (out-of-SWATH discard).
    "q_join_anti" -> GraftQuery(
      run = (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey"),
      oracle = Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    // Fact-to-fact equi-join with aggregation (orders ⋈ lineitem): the one
    // genuinely shuffling join — both sides hash-partition on the key.
    "q_join_fact_fact" -> GraftQuery(
      run = (s, d) =>
        Tables.orders(s, d)
          .join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_lines"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
              .as("revenue"))
          .orderBy("o_orderpriority"),
      oracle = Some("""
        SELECT o_orderpriority, count(*) AS n_lines,
               round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // TPC-H Q7 shape (volume shipping): revenue flow between two nations
    // by ship year. The two single-row nation filters broadcast, supplier/
    // customer dims broadcast, and the only real shuffle is lineitem ⋈
    // orders — with the nation predicates pushed through the dim joins
    // so most of both facts is filtered before the exchange.
    "q_join_tpch_q7" -> GraftQuery(
      run = (s, d) => {
        val n1 = "NATION_1"
        val n2 = "NATION_2"
        val nat = Tables.nation(s, d)
          .filter(col("n_name").isin(n1, n2))
          .select(col("n_nationkey"), col("n_name"))
        val sup = Tables.supplier(s, d)
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cst = Tables.customer(s, d)
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, d)
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cst), col("o_custkey") === col("c_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      oracle = Some("""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_1', 'NATION_2')
          AND n2.n_name IN ('NATION_1', 'NATION_2')
          AND n1.n_name <> n2.n_name
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // TPC-H Q10 shape (returned-item reporting): top customers by
    // revenue lost to returns in one quarter. Ranking is on the ROUNDED
    // revenue (then custkey) so the top-20 cut is identical in any
    // engine — ordering by the raw double would let a last-bit
    // summation difference flip the boundary row.
    "q_join_tpch_q10" -> GraftQuery(
      run = (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d)
              .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("2000-04-01").cast("timestamp")),
            col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20),
      oracle = Some("""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'
          AND o_orderdate < TIMESTAMP '2000-04-01'
          AND l_returnflag = 'R'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // TPC-H Q14 shape (promo revenue): month-scoped lineitem ⋈ part with
    // a conditional-revenue ratio. The month predicate reaches the scan
    // (PushedFilters), the part dim broadcasts; one row out.
    "q_join_tpch_q14" -> GraftQuery(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("2000-02-01").cast("timestamp"))
          .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .agg(round(
            lit(100.0) *
              sum(when(col("p_type") === "PROMO",
                col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .otherwise(lit(0.0))) /
              sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
            4).as("promo_revenue_pct")),
      oracle = Some("""
        SELECT round(
                 100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1.0 - l_discount)
                                  ELSE 0.0 END)
                 / sum(l_extendedprice * (1.0 - l_discount)), 4)
                 AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '2000-01-01'
          AND l_shipdate < TIMESTAMP '2000-02-01'""")),

    // TPC-H Q8 shape (national market share): the 8-table join — part
    // prunes the fact scan via its broadcast, orders carries the date
    // window to the scan, customer routes through nation→region (one
    // nation role) while supplier carries the second nation role.
    // Everything except the two fact joins (lineitem⋈orders on orderkey,
    // orders⋈customer on custkey) is a broadcast: the fact side shuffles
    // exactly twice regardless of scale.
    "q_join_tpch_q8" -> GraftQuery(
      run = (s, d) => {
        val amerNations = Tables.region(s, d)
          .filter(col("r_name") === "AMERICA")
          .join(Tables.nation(s, d), col("r_regionkey") === col("n_regionkey"))
          .select(col("n_nationkey").as("cn_key"))
        val supNation = Tables.nation(s, d)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("s_nation"))
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
              .filter(col("p_type") === "ECONOMY").select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, d)
              .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(amerNations), col("c_nationkey") === col("cn_key"))
          .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(supNation), col("s_nationkey") === col("sn_key"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(round(
            sum(when(col("s_nation") === "NATION_1",
              col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .otherwise(lit(0.0))) /
              sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
            4).as("mkt_share"))
          .orderBy("o_year")
      },
      oracle = Some("""
        SELECT year(o_orderdate) AS o_year,
               round(sum(CASE WHEN n2.n_name = 'NATION_1'
                              THEN l_extendedprice * (1.0 - l_discount)
                              ELSE 0.0 END)
                     / sum(l_extendedprice * (1.0 - l_discount)), 4)
                 AS mkt_share
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n1.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1 ORDER BY 1""")),

    // TPC-H Q13 shape (customer order-count distribution): LEFT join so
    // zero-order customers survive with c_count = 0, then a second
    // aggregation over the counts — the double-groupBy histogram.
    // Exact integers end to end.
    "q_join_tpch_q13" -> GraftQuery(
      run = (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d).select("o_custkey", "o_orderkey"),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc),
      oracle = Some("""
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""")),

    // TPC-H Q15 shape (top supplier): quarter-scoped per-supplier revenue,
    // then the max-revenue supplier(s) via a broadcast scalar. Revenue is
    // computed in exact integer 1e-4-dollar units (cents × discount
    // percentage points), so the revenue = max(revenue) equality — the
    // part of Q15 that is FP-fragile in doubles — is an exact integer
    // compare in both engines.
    "q_join_tpch_q15" -> GraftQuery(
      run = (s, d) => {
        val rev = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1999-04-01").cast("timestamp"))
          .withColumn("rev_e4",
            expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)") *
              (lit(100L) - expr("CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)")))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(col("rev_e4")).as("total_revenue_e4"))
        val mx = rev.agg(max(col("total_revenue_e4")).as("mx"))
        rev.crossJoin(broadcast(mx))
          .filter(col("total_revenue_e4") === col("mx"))
          .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
            col("supplier_no") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue_e4"))
          .orderBy("s_suppkey")
      },
      oracle = Some("""
        WITH rev AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(sum(floor(l_extendedprice * 100.0 + 0.5)::BIGINT *
                          (100 - floor(l_discount * 100.0 + 0.5)::BIGINT))
                      AS BIGINT) AS total_revenue_e4
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1999-01-01'
            AND l_shipdate < TIMESTAMP '1999-04-01'
          GROUP BY 1)
        SELECT s_suppkey, s_name, total_revenue_e4
        FROM rev JOIN supplier ON s_suppkey = supplier_no
        WHERE total_revenue_e4 = (SELECT max(total_revenue_e4) FROM rev)
        ORDER BY s_suppkey""")),

    // TPC-H Q19 shape (disjunctive predicates): an OR of three
    // brand/size/quantity conjunction bands across the lineitem ⋈ part
    // broadcast join — the classic test that a disjunction of
    // cross-table conjunctions still evaluates inside one codegen stage
    // after the join, with the common p_partkey equi-key extracted as
    // the join condition (no cartesian fallback).
    "q_join_tpch_q19" -> GraftQuery(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
              .select("p_partkey", "p_brand", "p_size")),
            col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 11)) ||
              (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
                col("l_quantity").between(10, 20)) ||
              (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
                col("l_quantity").between(20, 30)))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("revenue"),
            count(lit(1)).as("n_lines")),
      oracle = Some("""
        SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)""")),

    // TPC-H Q22 shape (global-sales opportunity): customers above the
    // positive-balance average with no recent order (none in the final
    // year of the data — the corpus is dense enough that literally
    // order-less customers don't exist), rolled up by nation. The
    // reference Q22 cuts on phone country codes (absent in this schema);
    // nation plays that role here. The average cutoff is an exact
    // integer (sum-of-cents div count), so the boundary compare can
    // never be FP-marginal; the "no recent order" test is a left-anti
    // join against the date-pruned orders fact.
    "q_join_tpch_q22" -> GraftQuery(
      run = (s, d) => {
        val cust = Tables.customer(s, d)
          .withColumn("bal_c",
            expr("CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)"))
        val cut = cust.filter(col("bal_c") > 0)
          .agg(expr("sum(bal_c) div count(1)").as("cut"))
        cust.crossJoin(broadcast(cut))
          .filter(col("bal_c") > col("cut"))
          .join(Tables.orders(s, d)
              .filter(col("o_orderdate") >= lit("2000-08-01").cast("timestamp"))
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("numcust"), sum(col("bal_c")).as("totacctbal_c"))
          .orderBy("n_name")
      },
      oracle = Some("""
        WITH cust AS (SELECT c_custkey, c_nationkey,
                             floor(c_acctbal * 100.0 + 0.5)::BIGINT AS bal_c
                      FROM customer),
        cut AS (SELECT CAST(sum(bal_c) // count(*) AS BIGINT) AS cut
                FROM cust WHERE bal_c > 0)
        SELECT n_name, count(*) AS numcust,
               CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
        FROM cust CROSS JOIN cut
        JOIN nation ON n_nationkey = c_nationkey
        WHERE bal_c > cut
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-08-01')
        GROUP BY n_name ORDER BY n_name""")),

    // Physical backward as-of join (custom LogicalPlan + strategy +
    // exec — graft.plans.AsOfJoin): each click matched to the user's
    // latest purchase at or before it, LEFT OUTER, broadcast build +
    // O(log n) probe, left side streaming unshuffled. The aggregate
    // formulation of the same family is q_join_asof; the oracle states
    // the windowed relational form.
    "q_join_asof_exec" -> GraftQuery(
      run = (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("t", expr("ts div 1000"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("t"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("p_user"), col("t").as("pt"))
        graft.plans.AsOfJoin
          .join(clicks, purchases, "user_id", "t", "p_user", "pt",
            "purchase_id")
          .select(col("click_id"), col("purchase_id"),
            (col("t") - col("pt")).as("lag_us"))
          .orderBy("click_id")
      },
      oracle = Some("""
        WITH c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS t
                   FROM events WHERE event_type = 'click'),
        p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pt
              FROM events WHERE event_type = 'purchase'),
        j AS (SELECT c.click_id, c.t, p.purchase_id, p.pt,
                     row_number() OVER (PARTITION BY c.click_id
                       ORDER BY p.pt DESC, p.purchase_id DESC) AS rn
              FROM c LEFT JOIN p
                ON p.user_id = c.user_id AND p.pt <= c.t)
        SELECT click_id, purchase_id, t - pt AS lag_us
        FROM j WHERE rn = 1 ORDER BY click_id""")),

    // --------------------- point-in-time multi-feature join (feature store)
    // The feature-store serving primitive: a spine of prediction events
    // (clicks) enriched with the LATEST value from EACH feature group as
    // of the event time — here two groups with different cadences (last
    // view value, last error value), NULL before a group's first update.
    // The scalable form is NOT one as-of join per group (N shuffles of
    // the spine, N probe structures): union-tag spine + all feature
    // streams, ONE shuffle on (user, time), then a carry-forward
    // last-non-null window per group — adding a feature group is one
    // more tagged leg in the union, zero extra exchanges. Visibility is
    // inclusive (feature at t == spine t is visible): features sort
    // BEFORE their equal-timestamp spine rows via the kind column, and
    // same-group same-instant updates resolve to the highest event_id —
    // deterministic in both engines.
    "q_join_pit" -> GraftQuery(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
        val spine = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(2).as("k"), lit(null).cast("double").as("va"),
            lit(null).cast("double").as("vb"))
        val fa = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(0).as("k"), col("value").as("va"),
            lit(null).cast("double").as("vb"))
        val fb = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(1).as("k"), lit(null).cast("double").as("va"),
            col("value").as("vb"))
        // order on the µs grid like the oracle's epoch_us — a ns-typed
        // events shipment must not order sub-µs neighbors differently
        val w = Window.partitionBy("user_id")
          .orderBy(expr("ts div 1000"), col("k"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.unionByName(fa).unionByName(fb)
          // both carries in ONE select → one Window operator (separate
          // withColumns planned two Window nodes with a redundant sort)
          .select(col("event_id"), col("user_id"), col("k"),
            last(col("va"), ignoreNulls = true).over(w).as("lva"),
            last(col("vb"), ignoreNulls = true).over(w).as("lvb"))
          .filter(col("k") === 2)
          .select(col("event_id"), col("user_id"),
            round(col("lva"), 4).as("last_view_value"),
            round(col("lvb"), 4).as("last_error_value"))
          .orderBy("event_id")
      },
      oracle = Some(pitOracleSql))
  )
}

package graft.operators

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reshape / set / generator operators (SURVEY.md §2.6).
  *
  * Reference patterns re-expressed:
  *  - param-grid cross product with ordinal ids ≙ model_index build
  *    (models.py:61-78): crossJoin of tiny dims + row_number — ordinal
  *    order is part of the contract (swath-major, then window, then ncomp)
  *  - component expansion ≙ spectrum_index (models.py:81-117):
  *    explode(sequence(0, ncomp-1)) + global ordered row_number
  *  - melt (wide→long)    ≙ matrix melts (msproc.py:443-468) via stack()
  *  - union-by-name       ≙ column alignment across maps (msproc.py:746-773)
  *  - conditional pivot   ≙ pivot_table (generate_slice_tensor.py:67-70) —
  *    expressed as codegen-friendly conditional aggregation
  *  - dedup               ≙ drop_duplicates (msproc.py:585)
  *
  * Scale notes: grids are built from broadcast-size dims; ordinals come
  * from row_number over explicit total orders (deterministic at any
  * parallelism — never monotonically_increasing_id, which is
  * partition-layout-dependent). The melt multiplies rows 3× before the
  * shuffle; at scale you'd aggregate first when semantics allow.
  */
object Reshape extends QueryPack {

  /** model-grid analog: region × nation-in-region × F ∈ {1,2,3}. */
  private def grid(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    val f = Seq(1, 2, 3).toDF("ncomp")
    val w = Window.orderBy("r_regionkey", "n_nationkey", "ncomp")
    Tables.region(s, d).select(col("r_regionkey"))
      .crossJoin(Tables.nation(s, d).select(col("n_nationkey")))
      .crossJoin(f)
      .withColumn("model_id", (row_number().over(w) - 1).cast("long"))
  }

  private val gridSqlCte = """
    grid AS (
      SELECT CAST(row_number() OVER (ORDER BY r_regionkey, n_nationkey, ncomp)
                  - 1 AS BIGINT) AS model_id,
             r_regionkey, n_nationkey, ncomp
      FROM (SELECT r_regionkey FROM region)
      CROSS JOIN (SELECT n_nationkey FROM nation)
      CROSS JOIN (VALUES (1), (2), (3)) f(ncomp))"""

  val queries: Map[String, GraftQuery] = Map(
    // Param-grid cross product with stable ordinal model ids.
    "q_reshape_model_grid" -> GraftQuery(
      run = (s, d) =>
        grid(s, d)
          .select(col("model_id"), col("r_regionkey"), col("n_nationkey"),
            col("ncomp"))
          .orderBy("model_id"),
      oracle = Some(s"""
        WITH $gridSqlCte
        SELECT model_id, r_regionkey, n_nationkey, ncomp
        FROM grid ORDER BY model_id""")),

    // Component expansion: explode 0..ncomp-1 per model + global scan id.
    "q_reshape_spectrum_expand" -> GraftQuery(
      run = (s, d) => {
        val w = Window.orderBy("model_id", "spectrum_num")
        grid(s, d)
          .withColumn("spectrum_num",
            explode(sequence(lit(0L), col("ncomp").cast("long") - 1)))
          .withColumn("scan", (row_number().over(w) - 1).cast("long"))
          .select(col("model_id"), col("ncomp"), col("spectrum_num"), col("scan"))
          .orderBy("scan")
      },
      oracle = Some(s"""
        WITH $gridSqlCte,
        expanded AS (
          SELECT model_id, ncomp,
                 unnest(generate_series(0, ncomp - 1)) AS spectrum_num
          FROM grid)
        SELECT model_id, ncomp, CAST(spectrum_num AS BIGINT) AS spectrum_num,
               CAST(row_number() OVER (ORDER BY model_id, spectrum_num) - 1
                    AS BIGINT) AS scan
        FROM expanded ORDER BY scan""")),

    // Melt: lineitem measures wide → long (stack is a generator — no
    // shuffle; rows expand 3× in the map stage).
    "q_reshape_melt" -> GraftQuery(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            expr("""stack(3,
              'quantity', l_quantity,
              'extendedprice', l_extendedprice,
              'discount', l_discount) AS (metric, val)"""))
          .orderBy("l_orderkey", "l_linenumber", "metric"),
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, metric, val FROM (
          SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
                 l_quantity AS val FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
          FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'discount', l_discount
          FROM lineitem)
        WHERE l_orderkey < 100
        ORDER BY l_orderkey, l_linenumber, metric""")),

    // Union-by-name of two differently-shaped inputs.
    "q_reshape_union_align" -> GraftQuery(
      run = (s, d) => {
        val c = Tables.customer(s, d)
          .select(col("c_name").as("name"), col("c_acctbal").as("acctbal"),
            lit("customer").as("role"))
        val p = Tables.supplier(s, d)
          .select(lit("supplier").as("role"), col("s_acctbal").as("acctbal"),
            col("s_name").as("name"))
        c.unionByName(p)
          .orderBy("role", "name")
      },
      oracle = Some("""
        SELECT name, acctbal, role FROM (
          SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS role
          FROM customer
          UNION ALL
          SELECT s_name, s_acctbal, 'supplier' FROM supplier)
        ORDER BY role, name""")),

    // --------------------------------------- set operations (EXCEPT/INTERSECT)
    // Set difference and intersection as first-class operators: users
    // who viewed but never purchased (EXCEPT) and users who did both
    // (INTERSECT). Spark plans both as hash joins over distinct keys
    // (left-anti / left-semi after de-dup) — one shuffle each on the
    // key, no sort, which is exactly the 100 TB shape; the oracle
    // states the declarative set form.
    "q_reshape_set_ops" -> GraftQuery(
      run = (s, d) => {
        // value > 90 sparsifies both sets so BOTH segments are
        // non-empty at every test SF (the unfiltered sets fully overlap)
        def users(t: String) = Tables.events(s, d)
          .filter(col("event_type") === t && col("value") > 90.0)
          .select("user_id")
        val viewedOnly = users("view").except(users("purchase"))
          .withColumn("segment", lit("viewed_only"))
        val both = users("view").intersect(users("purchase"))
          .withColumn("segment", lit("viewed_and_purchased"))
        viewedOnly.unionByName(both)
          .groupBy("segment")
          .agg(count(lit(1)).as("n_users"),
            min(col("user_id")).as("min_user"),
            max(col("user_id")).as("max_user"))
          .orderBy("segment")
      },
      oracle = Some("""
        WITH v AS (SELECT user_id FROM events
                   WHERE event_type = 'view' AND value > 90.0),
        p AS (SELECT user_id FROM events
              WHERE event_type = 'purchase' AND value > 90.0),
        seg AS (
          SELECT user_id, 'viewed_only' AS segment
          FROM (SELECT * FROM v EXCEPT SELECT * FROM p)
          UNION ALL
          SELECT user_id, 'viewed_and_purchased'
          FROM (SELECT * FROM v INTERSECT SELECT * FROM p))
        SELECT segment, count(*) AS n_users, min(user_id) AS min_user,
               max(user_id) AS max_user
        FROM seg GROUP BY segment ORDER BY segment""")),

    // Conditional pivot: one column per event_type, single hash aggregate
    // (no Spark pivot() two-pass; fully codegen'd sum(CASE WHEN ...)).
    "q_reshape_pivot" -> GraftQuery(
      run = (s, d) => {
        def s4(t: String) = round(
          sum(when(col("event_type") === t, col("value")).otherwise(0.0)), 4)
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(
            s4("click").as("click_value"),
            s4("view").as("view_value"),
            s4("purchase").as("purchase_value"),
            s4("signup").as("signup_value"),
            s4("error").as("error_value"))
          .orderBy("user_id")
      },
      oracle = Some("""
        SELECT user_id,
          round(sum(CASE WHEN event_type='click' THEN value ELSE 0.0 END), 4)
            AS click_value,
          round(sum(CASE WHEN event_type='view' THEN value ELSE 0.0 END), 4)
            AS view_value,
          round(sum(CASE WHEN event_type='purchase' THEN value ELSE 0.0 END), 4)
            AS purchase_value,
          round(sum(CASE WHEN event_type='signup' THEN value ELSE 0.0 END), 4)
            AS signup_value,
          round(sum(CASE WHEN event_type='error' THEN value ELSE 0.0 END), 4)
            AS error_value
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // Dedup: distinct on a projection.
    "q_reshape_distinct" -> GraftQuery(
      run = (s, d) =>
        Tables.orders(s, d)
          .select(col("o_orderstatus"), col("o_orderpriority"))
          .distinct()
          .orderBy("o_orderstatus", "o_orderpriority"),
      oracle = Some("""
        SELECT DISTINCT o_orderstatus, o_orderpriority
        FROM orders ORDER BY o_orderstatus, o_orderpriority"""))
  )
}

package graft.operators

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Graph analytics over relationally-derived graphs — the operator class
  * a training-data pipeline needs for link/citation/co-occurrence
  * structure (domain ranking for crawl prioritization, co-purchase /
  * co-citation communities), expressed as iterative DataFrame plans.
  *
  * Both queries keep EVERY quantity in 64-bit integer arithmetic
  * (fixed-point ranks, exact counts) so the result is bit-identical in
  * any engine regardless of join order, partial-aggregation order, or
  * summation tree — the lesson from the round-1 LSH hash fail, applied
  * as a design rule: iterative numeric algorithms over shuffled data
  * must not let IEEE addition order reach the output.
  *
  * Scale notes:
  *  - PageRank: the rank/edge join shuffles on node id with map-side
  *    partial aggregation of contributions; the edge table is built once
  *    (one fact-fact shuffle) and cached. At web scale (billions of
  *    nodes) the identical plan holds — ranks co-partition with edges by
  *    node id and each iteration is one shuffle; nothing here assumes
  *    the node universe fits anywhere.
  *  - Triangles: degree orientation (edges point low→high degree) bounds
  *    every out-neighborhood by O(√m), which bounds the wedge join —
  *    the standard trick that makes distributed triangle counting
  *    feasible on skewed graphs (a celebrity node of degree 10⁶
  *    otherwise emits 10¹² wedges).
  */
object GraphOps extends QueryPack {

  /** Fixed-point scale for PageRank ranks (1.0 == 10¹²). Headroom:
    * rank ≤ SCALE and edge weights ≤ ~10⁶ keep rank·w ≤ 10¹⁸ < 2⁶³−1;
    * beyond that the same plan runs on DECIMAL(38,0). */
  private val Scale = 1000000000000L
  private val Iters = 5

  /** Distinct undirected co-purchase edges (u < v): parts appearing in
    * the same order. Per-order item counts are bounded (TPC-H ≤ 7), so
    * the orderkey self-join emits O(k²)-per-order = O(|lineitem|) pairs
    * — no quadratic hazard at any corpus size. */
  private def coPurchaseEdges(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
    li.as("a")
      .join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
  }

  /** The co-purchase edge list as a DuckDB CTE (mirror of
    * [[coPurchaseEdges]]). */
  private val coPurchaseCte = """
        e0 AS (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)"""

  /** Materialize a small (aggregate-sized) result, release the plan's
    * caches, and return the rows as a local frame — returning the lazy
    * plan would pin the caches in executor storage for the session
    * (the q_sim_ivfpq leak class). The lazy builders below stay
    * exposed so `PlanGuardSpec` can still assert the REAL physical
    * plan (the materialized frame is just a LocalTableScan). */
  private def materializeAndRelease(
      s: org.apache.spark.sql.SparkSession,
      out: org.apache.spark.sql.DataFrame,
      caches: Seq[org.apache.spark.sql.DataFrame])
      : org.apache.spark.sql.DataFrame = {
    val rows = out.collect()
    caches.foreach(_.unpersist())
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Lazy PageRank plan + the caches it reads (empty if the zero-node
    * guard already released them). */
  private[operators] def pagerankPlan(
      s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) = {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val edges = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
      .persist()
    // materialize the cache with ONE action before the plan below
    // reads it 2 + Iters times (un-materialized caches are raced by
    // sibling branches of the same job and recompute the fact join)
    edges.count()
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node"))).distinct()
      .persist()
    val nNodes = nodes.count()
    if (nNodes == 0) {
      // zero-row guard: an empty edge set must yield an empty result,
      // not a driver-side division by zero in the rank constants
      edges.unpersist(); nodes.unpersist()
      (Tables.nation(s, d)
        .select(col("n_name"), lit(0L).as("rank_scaled")).limit(0), Nil)
    } else {
      val outw = edges.groupBy("src").agg(sum(col("w")).as("ow"))
      val base = lit(15L * Scale / (100L * nNodes))
      var ranks = nodes.withColumn("rank", lit(Scale / nNodes))
      (1 to Iters).foreach { _ =>
        val contrib = ranks
          .join(edges, col("node") === col("src"))
          .join(outw, Seq("src"))
          .select(col("dst"), expr("rank * w div ow").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("inr"))
        ranks = nodes
          .join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            (base + expr("85 * coalesce(inr, 0L) div 100")).as("rank"))
      }
      val out = ranks
        .join(broadcast(Tables.nation(s, d)),
          col("node") === col("n_nationkey"))
        .select(col("n_name"), col("rank").as("rank_scaled"))
        .orderBy(col("rank_scaled").desc, col("n_name"))
      (out, Seq(edges, nodes))
    }
  }

  /** Lazy degree-oriented triangle-count plan + its caches. */
  private[operators] def trianglesPlan(
      s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) = {
    val e0 = coPurchaseEdges(s, d).persist()
    e0.count() // materialize before the multi-branch reads below
    val deg = e0.select(col("u").as("x"))
      .unionByName(e0.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("dg"))
      .persist()
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oe = e0
      .join(broadcast(deg.select(col("x").as("u"), col("dg").as("du"))), "u")
      .join(broadcast(deg.select(col("x").as("v"), col("dg").as("dv"))), "v")
      .select(when(lowFirst, col("u")).otherwise(col("v")).as("a"),
        when(lowFirst, col("v")).otherwise(col("u")).as("b"),
        when(lowFirst, col("dv")).otherwise(col("du")).as("db"))
      .persist()
    val nOriented = oe.count()
    // the wedge self-join stays a SHUFFLED equi-join on `a`
    // deliberately: both sides are the (small) edge list and the
    // shuffle co-locates each vertex's out-list once — measured faster
    // than a broadcast probe here (better per-partition locality than
    // hashing into one 1M-entry map per task)
    val fitsBroadcast = nOriented <= 20000000L
    val wedges = oe.as("e1")
      .join(oe.as("e2"),
        col("e1.a") === col("e2.a") &&
          (col("e1.db") < col("e2.db") ||
            (col("e1.db") === col("e2.db") && col("e1.b") < col("e2.b"))))
      .select(col("e1.b").as("x"), col("e2.b").as("y"))
    // One pass over the wedge stream: LEFT-join the closing edge
    // (oe rows are distinct, so at most one match per wedge) and
    // count wedges + closed wedges in the same aggregate — the wedge
    // join is the expensive stage and must not run twice. The wedge
    // stream is Θ(Σ outdeg²) ≫ |E| on dense graphs, so when the
    // oriented edge list fits a broadcast (3 longs/row → ~24 B; 20M
    // rows ≈ 500 MB is the practical ceiling), ship EDGES to the
    // wedges and close map-side — the wedge stream then never
    // shuffles at all. Beyond the ceiling, fall back to the shuffled
    // equi-join (both sides hash on (x, y)) — the plan that scales to
    // any edge count.
    val closing =
      if (fitsBroadcast) broadcast(oe.as("e3")) else oe.as("e3")
    val closure = wedges
      .join(closing,
        col("x") === col("e3.a") && col("y") === col("e3.b"), "left")
      .agg(count(lit(1)).as("n_wedges"),
        count(col("e3.a")).as("n_triangles"))
    val out = deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(e0.agg(count(lit(1)).as("n_edges")))
      .crossJoin(closure)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"))
    (out, Seq(e0, deg, oe))
  }

  /** Lazy bounded-BFS plan + its caches. */
  private[operators] def bfsPlan(
      s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) = {
    val e0 = coPurchaseEdges(s, d).persist()
    e0.count() // materialize before the two-branch union below
    val edges = e0.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(e0.select(col("v").as("src"), col("u").as("dst")))
      .persist()
    var dist = edges.select(col("src").as("node")).distinct()
      .filter(col("node") % 97 === 0)
      .withColumn("dist", lit(0))
      .persist()
    dist.count()
    (1 to 3).foreach { _ =>
      // each round reads the frontier TWICE (relax + carry); persist
      // and materialize per round or round k recomputes round k−1
      // in both branches — 2^k blowup over the loop
      val next = dist
        .join(edges, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + lit(1)).as("dist"))
        .unionByName(dist)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .persist()
      next.count()
      dist.unpersist()
      dist = next
    }
    val out = dist.groupBy("dist").agg(count(lit(1)).as("n_nodes"))
      .orderBy("dist")
    (out, Seq(e0, edges, dist))
  }

  val queries: Map[String, GraftQuery] = Map(

    // -------------------------------------------------- weighted PageRank
    // Nation-level trade graph: supplier nation → customer nation,
    // weighted by shipped lineitems. 5 damped iterations (d=0.85) in
    // fixed-point: contrib(u→v) = rank(u)·w div out_w(u);
    // rank'(v) = 15·SCALE div (100·N) + 85·Σcontrib div 100.
    "q_graph_pagerank" -> GraftQuery(
      run = (s, d) => {
        val (out, caches) = pagerankPlan(s, d)
        if (caches.isEmpty) out else materializeAndRelease(s, out, caches)
      },
      oracle = Some {
        def iter(prev: String, cur: String) = s"""
        $cur AS (
          SELECT b.node,
                 p.base + (85 * coalesce(s.inr, 0)) // 100 AS rank
          FROM nodes b CROSS JOIN params p
          LEFT JOIN (SELECT e.dst,
                            CAST(sum((r.rank * e.w) // o.ow) AS BIGINT) AS inr
                     FROM $prev r JOIN edges e ON e.src = r.node
                          JOIN outw o ON o.src = e.src
                     GROUP BY e.dst) s ON s.dst = b.node)"""
        s"""
        WITH edges AS (
          SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY 1, 2),
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        params AS (SELECT count(*) AS n,
                          (15 * ${Scale}) // (100 * count(*)) AS base
                   FROM nodes),
        outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow
                 FROM edges GROUP BY src),
        it0 AS (SELECT node, ${Scale} // p.n AS rank
                FROM nodes CROSS JOIN params p),
        ${(1 to Iters).map(i => iter(s"it${i - 1}", s"it$i"))
          .mkString(",").replaceFirst("^,?\\s*", "")}
        SELECT n_name, rank AS rank_scaled
        FROM it$Iters JOIN nation ON n_nationkey = node
        ORDER BY rank_scaled DESC, n_name"""
      }),

    // ------------------------------------- degree-oriented triangle count
    // Co-purchase graph: parts co-occurring in an order are linked.
    // Orientation by (degree, id) bounds out-neighborhoods; each triangle
    // is counted exactly once at its lowest-rank apex.
    "q_graph_triangles" -> GraftQuery(
      run = (s, d) => {
        val (out, caches) = trianglesPlan(s, d)
        materializeAndRelease(s, out, caches)
      },
      oracle = Some(s"""
        WITH $coPurchaseCte,
        deg AS (SELECT x, count(*) AS dg FROM (
                  SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0)
                GROUP BY x),
        oe AS (
          SELECT CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
                      THEN u ELSE v END AS a,
                 CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
                      THEN v ELSE u END AS b
          FROM e0 JOIN deg du ON du.x = e0.u JOIN deg dv ON dv.x = e0.v),
        oed AS (SELECT oe.a, oe.b, deg.dg AS db
                FROM oe JOIN deg ON deg.x = oe.b),
        w AS (SELECT e1.b AS x, e2.b AS y
              FROM oed e1 JOIN oed e2
                ON e1.a = e2.a AND (e1.db < e2.db OR
                   (e1.db = e2.db AND e1.b < e2.b)))
        SELECT (SELECT count(*) FROM deg) AS n_nodes,
               (SELECT count(*) FROM e0) AS n_edges,
               (SELECT count(*) FROM w) AS n_wedges,
               (SELECT count(*) FROM w JOIN oed e3
                  ON e3.a = w.x AND e3.b = w.y) AS n_triangles""")),

    // --------------------------- market-basket lift (association rules)
    // Co-occurrence lift over the order/part bipartite relation:
    // lift(a,b) = N·c_ab / (c_a·c_b) with a support floor — the
    // classic association-rule screen. All counts are exact integers
    // (distinct order sets), the ranking cut is on the ROUNDED lift
    // with a (u, v) tie-break, and nothing here is quadratic: pair
    // counts come from the bounded per-order self-join, singleton
    // counts from one aggregate, N from a scalar.
    "q_graph_lift" -> GraftQuery(
      run = (s, d) => {
        val li = Tables.lineitem(s, d)
          .select("l_orderkey", "l_partkey").distinct()
        val pairCnt = li.as("a")
          .join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
          .agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 3)
        val single = li.groupBy(col("l_partkey").as("p"))
          .agg(count(lit(1)).as("c"))
        val nOrders = li.select(col("l_orderkey")).distinct()
          .agg(count(lit(1)).as("n_orders"))
        pairCnt
          .join(broadcast(single.select(col("p").as("u"), col("c").as("c_a"))), "u")
          .join(broadcast(single.select(col("p").as("v"), col("c").as("c_b"))), "v")
          .crossJoin(broadcast(nOrders))
          .select(col("u"), col("v"), col("c_ab"),
            round(col("n_orders") * col("c_ab") /
              (col("c_a") * col("c_b")).cast("double"), 4).as("lift"))
          .orderBy(col("lift").desc, col("u"), col("v"))
          .limit(20)
      },
      oracle = Some("""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pc AS (SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS c_ab
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 3),
        sc AS (SELECT l_partkey AS p, count(*) AS c FROM li GROUP BY 1),
        n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li)
        SELECT u, v, c_ab,
               round(n_orders * c_ab / CAST(ca.c * cb.c AS DOUBLE), 4)
                 AS lift
        FROM pc JOIN sc ca ON ca.p = u JOIN sc cb ON cb.p = v CROSS JOIN n
        ORDER BY lift DESC, u, v LIMIT 20""")),

    // --------------------------------- bounded multi-source BFS frontier
    // 3 rounds of min-distance propagation from a deterministic seed set
    // (node id ≡ 0 mod 97) over the undirected co-purchase graph —
    // the "how far does influence spread" primitive (and the building
    // block of hop-bounded joins). Distances are exact integers; each
    // round is one shuffle on node id, the identical plan at any graph
    // size. Output: node count per distance.
    "q_graph_bfs" -> GraftQuery(
      run = (s, d) => {
        val (out, caches) = bfsPlan(s, d)
        materializeAndRelease(s, out, caches)
      },
      oracle = Some {
        def round(prev: String, cur: String) = s"""
        $cur AS (
          SELECT node, min(dist) AS dist FROM (
            SELECT e.dst AS node, p.dist + 1 AS dist
            FROM $prev p JOIN edges e ON e.src = p.node
            UNION ALL SELECT node, dist FROM $prev)
          GROUP BY node)"""
        s"""
        WITH $coPurchaseCte,
        edges AS (SELECT u AS src, v AS dst FROM e0
                  UNION ALL SELECT v, u FROM e0),
        d0 AS (SELECT DISTINCT src AS node, 0 AS dist FROM edges
               WHERE src % 97 = 0),
        ${round("d0", "d1")},
        ${round("d1", "d2")},
        ${round("d2", "d3")}
        SELECT dist, count(*) AS n_nodes FROM d3
        GROUP BY dist ORDER BY dist"""
      })
  )
}

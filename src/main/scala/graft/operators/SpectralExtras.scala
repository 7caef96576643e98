package graft.operators

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining reference operator surface from msproc's analysis helpers
  * (SURVEY.md §2.2–2.4, §2.7):
  *
  *  - float-tolerance membership ≙ `isin_float` (msproc.py:730-743):
  *    `np.isclose(data, points, atol).any()` as a broadcast range join —
  *    the point list is tiny, the fact side streams unshuffled.
  *  - nearest-value lookup ≙ `index_of_nearest_value` (msproc.py:726-727):
  *    as-of-style argmin |a−b| with a deterministic tie-break. At scale
  *    this becomes a range-partitioned sort-merge; the window
  *    formulation here keeps the same semantics.
  *  - argmax row selection ≙ pseudo-precursor idxmax (msproc.py:301-307):
  *    `max_by(struct)` with a total-order tie-break.
  *  - histogram-percentile cutoff ≙ MS2 intensity floor
  *    (msproc.py:660-685): 100 equal-width bins between global min/max,
  *    keep rows at or above the cutoff bin's lower edge. Bin edges come
  *    from a 1-row broadcast aggregate, never a driver collect.
  *  - theoretical fragment masses ≙ b/y ions (msproc.py:709-719,
  *    pyteomics fast_mass2): monoisotopic residue-mass table as a CASE
  *    expression; peptides derived deterministically from part names.
  */
object SpectralExtras extends QueryPack {

  /** Monoisotopic residue masses (standard 20 AA). */
  private val aaMass: Seq[(String, Double)] = Seq(
    "A" -> 71.03711, "C" -> 103.00919, "D" -> 115.02694, "E" -> 129.04259,
    "F" -> 147.06841, "G" -> 57.02146, "H" -> 137.05891, "I" -> 113.08406,
    "K" -> 128.09496, "L" -> 113.08406, "M" -> 131.04049, "N" -> 114.04293,
    "P" -> 97.05276, "Q" -> 128.05858, "R" -> 156.10111, "S" -> 87.03203,
    "T" -> 101.04768, "V" -> 99.06841, "W" -> 186.07931, "Y" -> 163.06333)

  private val proton = 1.00727646677
  private val water = 18.0105646863

  /** CASE mapping a single-char column expr to its residue mass —
    * identical text parses in Spark SQL and DuckDB. */
  private def massCase(e: String): String =
    aaMass.map { case (a, m) => s"WHEN '$a' THEN $m" }
      .mkString(s"CASE $e ", " ", " ELSE 0.0 END")

  private val peptideExpr =
    "upper(substr(regexp_replace(lower(p_name), '[^acdefghiklmnpqrstvwy]', ''), 1, 8))"

  /** DuckDB regexp_replace needs the 'g' flag (Spark is always global). */
  private val peptideExprDuck =
    "upper(substr(regexp_replace(lower(p_name), '[^acdefghiklmnpqrstvwy]', '', 'g'), 1, 8))"

  val queries: Map[String, GraftQuery] = Map(

    // ------------------------------------------- float-tolerance membership
    "q_join_tolerance" -> GraftQuery(
      run = (s, d) => {
        val points = Tables.part(s, d)
          .filter(col("p_partkey") < 20)
          .select(col("p_partkey").as("point_id"),
            col("p_retailprice").as("point"))
        Tables.lineitem(s, d)
          .join(broadcast(points),
            abs(col("l_extendedprice") - col("point")) <= 0.5)
          .groupBy(col("point_id"))
          .agg(count(lit(1)).as("n_close"),
            round(min(col("l_extendedprice")), 2).as("lo_match"),
            round(max(col("l_extendedprice")), 2).as("hi_match"))
          .orderBy("point_id")
      },
      oracle = Some("""
        SELECT p_partkey AS point_id, count(*) AS n_close,
               round(min(l_extendedprice), 2) AS lo_match,
               round(max(l_extendedprice), 2) AS hi_match
        FROM part JOIN lineitem
          ON abs(l_extendedprice - p_retailprice) <= 0.5
        WHERE p_partkey < 20
        GROUP BY p_partkey ORDER BY p_partkey""")),

    // ------------------------------------------------ nearest-value (as-of)
    "q_join_asof" -> GraftQuery(
      run = (s, d) => {
        // argmin as min(struct(diff, key)) — a partial-aggregable hash
        // aggregate (map-side combine), NOT a row_number window, which
        // would full-sort the |sup|×|cust| pair stream. Lexicographic
        // struct order == ORDER BY diff, custkey, so tie-breaks match
        // the oracle exactly.
        val sup = Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_acctbal"))
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_acctbal"))
        broadcast(sup).join(cust)
          .select(col("s_suppkey"),
            struct(abs(col("s_acctbal") - col("c_acctbal")).as("diff"),
              col("c_custkey").as("cust")).as("p"))
          .groupBy("s_suppkey")
          .agg(min(col("p")).as("best"))
          .select(col("s_suppkey"), col("best.cust").as("nearest_cust"),
            round(col("best.diff"), 2).as("diff"))
          .orderBy("s_suppkey")
      },
      oracle = Some("""
        SELECT s_suppkey, c_custkey AS nearest_cust,
               round(abs(s_acctbal - c_acctbal), 2) AS diff
        FROM (SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal,
                     row_number() OVER (PARTITION BY s_suppkey
                       ORDER BY abs(s_acctbal - c_acctbal), c_custkey) AS rn
              FROM supplier, customer)
        WHERE rn = 1 ORDER BY s_suppkey""")),

    // --------------------------------------------- argmax pseudo-precursor
    "q_agg_argmax" -> GraftQuery(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(
            max_by(struct(col("l_partkey"), col("l_quantity")),
              struct(col("l_extendedprice"), col("l_linenumber"))).as("best"),
            round(max(col("l_extendedprice")), 2).as("max_price"))
          .select(col("l_orderkey"), col("best.l_partkey").as("best_partkey"),
            round(col("best.l_quantity"), 2).as("best_quantity"),
            col("max_price"))
          .orderBy("l_orderkey"),
      oracle = Some("""
        SELECT l_orderkey, l_partkey AS best_partkey,
               round(l_quantity, 2) AS best_quantity,
               round(mx, 2) AS max_price
        FROM (SELECT l_orderkey, l_partkey, l_quantity,
                     max(l_extendedprice) OVER (PARTITION BY l_orderkey) AS mx,
                     row_number() OVER (PARTITION BY l_orderkey
                       ORDER BY l_extendedprice DESC, l_linenumber DESC) AS rn
              FROM lineitem)
        WHERE rn = 1 ORDER BY l_orderkey""")),

    // ------------------------------------------ histogram-percentile cutoff
    "q_filter_percentile_cutoff" -> GraftQuery(
      run = (s, d) => {
        val ev = Tables.events(s, d)
        val mm = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
        ev.crossJoin(broadcast(mm))
          .filter(col("value") >=
            col("lo") + (col("hi") - col("lo")) * 5.0 / 100.0)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_kept"),
            round(sum(col("value")), 4).as("sum_kept"))
          .orderBy("event_type")
      },
      oracle = Some("""
        SELECT event_type, count(*) AS n_kept,
               round(sum(value), 4) AS sum_kept
        FROM events,
             (SELECT min(value) AS lo, max(value) AS hi FROM events) mm
        WHERE value >= mm.lo + (mm.hi - mm.lo) * 5.0 / 100.0
        GROUP BY event_type ORDER BY event_type""")),

    // -------------------------------------------------- ranking analytics
    // rank / dense_rank / ntile in one window pass (beyond the
    // reference's surface — SURVEY §2.5 notes it has none).
    "q_window_ranks" -> GraftQuery(
      run = (s, d) => {
        // rank/dense_rank over a COARSE key (hundreds bucket) so ties
        // exist and the two actually differ; ntile over a unique total
        // order so its assignment is engine-independent
        val wTies = org.apache.spark.sql.expressions.Window
          .partitionBy("n_nationkey")
          .orderBy(round(col("c_acctbal"), -2).desc)
        val wUnique = org.apache.spark.sql.expressions.Window
          .partitionBy("n_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("c_custkey"),
            rank().over(wTies).as("rnk"),
            dense_rank().over(wTies).as("drnk"),
            ntile(4).over(wUnique).as("quartile"))
          .filter(col("rnk") <= 5)
          .orderBy("n_name", "rnk", "c_custkey")
      },
      oracle = Some("""
        SELECT n_name, c_custkey, rnk, drnk, quartile FROM (
          SELECT n_name, c_custkey,
                 rank() OVER wt AS rnk,
                 dense_rank() OVER wt AS drnk,
                 ntile(4) OVER wu AS quartile
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          WINDOW wt AS (PARTITION BY n_nationkey
                        ORDER BY round(c_acctbal, -2) DESC),
                 wu AS (PARTITION BY n_nationkey
                        ORDER BY c_acctbal DESC, c_custkey))
        WHERE rnk <= 5 ORDER BY n_name, rnk, c_custkey""")),

    // ----------------------------------------------------- JSON extraction
    // Typed access into the events.props JSON column (semi-structured
    // payloads are first-class at corpus scale).
    "q_scalar_json" -> GraftQuery(
      run = (s, d) =>
        Tables.events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy(col("event_type"))
          .agg(count(col("k")).as("n_with_k"),
            round(avg(col("k")), 4).as("avg_k"),
            max(col("k")).as("max_k"))
          .orderBy("event_type"),
      oracle = Some("""
        SELECT event_type,
               count(CAST(json_extract(props, '$.k') AS INT)) AS n_with_k,
               round(avg(CAST(json_extract(props, '$.k') AS INT)), 4) AS avg_k,
               max(CAST(json_extract(props, '$.k') AS INT)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ------------------------------------------------ b/y fragment masses
    "q_scalar_fragment_masses" -> GraftQuery(
      run = (s, d) =>
        Tables.part(s, d)
          .withColumn("peptide", expr(peptideExpr))
          .filter(length(col("peptide")) >= 2)
          .withColumn("n", length(col("peptide")))
          .withColumn("full_mass", expr(
            s"aggregate(transform(split(peptide, ''), " +
              s"c -> ${massCase("c")}), 0D, (a, x) -> a + x) + $water + $proton"))
          .withColumn("b2", expr(
            s"CAST(${massCase("substr(peptide, 1, 1)")} + " +
              s"${massCase("substr(peptide, 2, 1)")} + $proton AS DOUBLE)"))
          .withColumn("y2", expr(
            s"CAST(${massCase("substr(peptide, n - 1, 1)")} + " +
              s"${massCase("substr(peptide, n, 1)")} + $water + $proton AS DOUBLE)"))
          .select(col("p_partkey"), col("peptide"), col("n"),
            round(col("full_mass"), 4).as("full_mass"),
            round(col("b2"), 4).as("b2"), round(col("y2"), 4).as("y2"))
          .orderBy("p_partkey"),
      oracle = Some(s"""
        WITH pep AS (
          SELECT p_partkey, $peptideExprDuck AS peptide FROM part),
        chars AS (
          SELECT p_partkey, peptide, length(peptide) AS n,
                 unnest(string_split_regex(peptide, '')) AS c
          FROM pep WHERE length(peptide) >= 2),
        masses AS (
          SELECT p_partkey, peptide, n,
                 sum(CAST(${massCase("c")} AS DOUBLE)) AS residue_sum
          FROM chars WHERE c <> '' GROUP BY p_partkey, peptide, n)
        SELECT p_partkey, peptide, n,
               round(CAST(residue_sum + $water + $proton AS DOUBLE), 4)
                 AS full_mass,
               round(CAST(${massCase("substr(peptide, 1, 1)")} +
                     ${massCase("substr(peptide, 2, 1)")} + $proton AS DOUBLE),
                     4) AS b2,
               round(CAST(${massCase("substr(peptide, n - 1, 1)")} +
                     ${massCase("substr(peptide, n, 1)")} + $water + $proton
                     AS DOUBLE), 4) AS y2
        FROM masses ORDER BY p_partkey"""))
  )
}

package graft.operators

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.4).
  *
  * Each query re-expresses one aggregation pattern from the reference
  * pipeline on the driver's star schema:
  *  - pricing summary   ≙ round-mz+sum / round-rt+mean rollups
  *    (reference msproc.py:634-657)
  *  - global extrema    ≙ max-RT scan (split_csv_maps_to_slices.py:62) —
  *    done as agg(max), not the reference's .rdd.max() detour
  *  - count-distinct    ≙ distinct time points (msproc.py:698-706)
  *  - CV                ≙ stddev_pop/mean per component
  *    (collect_sample_modes.py:92-95, scipy.stats.variation)
  *  - unimodal fraction ≙ count(when)/count(*) (select_best_models.R:16-28)
  *  - histogram bins    ≙ 100-bin intensity cutoff (msproc.py:660-685)
  *  - median            ≙ median sequence length (seqproc.py:61-77)
  *  - group-wise max    ≙ best-model selection (select_best_models.R:34-35)
  *
  * Scale notes: every aggregate here is a hash aggregate with map-side
  * partial aggregation (Catalyst emits partial + final HashAggregate), so
  * the shuffle carries one row per group per task — at 100 TB the shuffled
  * volume is O(groups × tasks), not O(rows). The histogram derives its bin
  * edges from a 1-row broadcast aggregate, not a driver collect.
  */
object Aggregates extends QueryPack {

  val queries: Map[String, GraftQuery] = Map(
    // TPC-H Q1-shaped rollup: group on two low-cardinality flags.
    // Hierarchical ROLLUP (grouping sets): absent in the reference
    // (SURVEY §2.4) but free from Catalyst — subtotals and grand total
    // in one pass with partial aggregation per grouping set.
    "q_agg_rollup_sets" -> GraftQuery(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 2).as("sum_qty"))
          .orderBy("l_returnflag", "l_linestatus"),
      oracle = Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus""")),

    // Exact quartiles per group (percentile with linear interpolation —
    // the same rank = p·(n−1) definition DuckDB's quantile_cont uses;
    // q_scale_approx_quantile is the sketched scale path, this is the
    // exact small-group form).
    "q_agg_percentiles" -> GraftQuery(
      run = (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(percentile(col("value"), lit(0.25)).as("p25r"),
            percentile(col("value"), lit(0.5)).as("p50r"),
            percentile(col("value"), lit(0.75)).as("p75r"))
          .select(col("event_type"),
            round(col("p25r"), 4).as("p25"),
            round(col("p50r"), 4).as("p50"),
            round(col("p75r"), 4).as("p75"))
          .orderBy("event_type"),
      oracle = Some("""
        SELECT event_type,
               round(quantile_cont(value, 0.25), 4) AS p25,
               round(quantile_cont(value, 0.50), 4) AS p50,
               round(quantile_cont(value, 0.75), 4) AS p75
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // CUBE + grouping_id: all 4 grouping-set combinations in one pass
    // (beyond ref — completes the grouping-sets family next to ROLLUP).
    // grouping_id disambiguates "NULL because aggregated" from "NULL in
    // the data", the standard cube-consumer contract.
    "q_agg_cube" -> GraftQuery(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().as("gid"),
            count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 2).as("sum_qty"))
          .orderBy("gid", "l_returnflag", "l_linestatus"),
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                    AS BIGINT) AS gid,
               count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag, l_linestatus""")),

    // Round-key rollup: round-mz+sum / round-rt+mean (msproc.py:634-657) —
    // grouping on rounded continuous values collapses near-identical
    // readings before the shuffle.
    "q_agg_round_rollup" -> GraftQuery(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(
            round(col("l_extendedprice"), -2).as("price_bucket"),
            round(col("l_discount"), 1).as("disc_bucket"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 2).as("sum_qty"))
          .orderBy("price_bucket", "disc_bucket"),
      oracle = Some("""
        SELECT round(l_extendedprice, -2) AS price_bucket,
               round(l_discount, 1) AS disc_bucket,
               count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY round(l_extendedprice, -2), round(l_discount, 1)
        ORDER BY price_bucket, disc_bucket""")),

    "q_agg_pricing_summary" -> GraftQuery(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 4).as("sum_qty"),
            round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
              .as("sum_disc_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_base_price,
               round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // Global extrema scan (reference computed max rt to derive RT windows).
    "q_agg_global_extrema" -> GraftQuery(
      run = (s, d) =>
        Tables.events(s, d).agg(
          max(col("value")).as("max_value"),
          min(col("value")).as("min_value"),
          count(lit(1)).as("n_rows")),
      oracle = Some("""
        SELECT max(value) AS max_value, min(value) AS min_value,
               count(*) AS n_rows
        FROM events""")),

    // countDistinct per group (exact — the reference never approximates).
    "q_agg_count_distinct" -> GraftQuery(
      run = (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(
            countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
          .orderBy("event_type"),
      oracle = Some("""
        SELECT event_type, count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // Coefficient of variation: population stddev / mean (scipy semantics).
    "q_agg_cv" -> GraftQuery(
      run = (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(round(stddev_pop(col("value")) / avg(col("value")), 4).as("cv_value"))
          .orderBy("event_type"),
      oracle = Some("""
        SELECT event_type, round(stddev_pop(value) / avg(value), 4) AS cv_value
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // Unimodal-fraction pattern: conditional count over total.
    "q_agg_unimodal_fraction" -> GraftQuery(
      run = (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(
            round(count(when(col("o_orderstatus") === "F", 1)).cast("double") /
              count(lit(1)), 4).as("frac_f"),
            count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority"),
      oracle = Some("""
        SELECT o_orderpriority,
               round(CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS DOUBLE)
                     / count(*), 4) AS frac_f,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // 100-bin histogram of a measure; only bin ids + counts are emitted
    // (the reference only uses bin edges for its intensity cutoff).
    "q_agg_histogram" -> GraftQuery(
      run = (s, d) => {
        val li = Tables.lineitem(s, d)
        val mm = li.agg(
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
        li.crossJoin(broadcast(mm))
          .withColumn("bin",
            least(floor((col("l_extendedprice") - col("lo")) * 100.0 /
              (col("hi") - col("lo"))), lit(99L)).cast("long"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"))
          .orderBy("bin")
      },
      oracle = Some("""
        SELECT CAST(least(floor((l_extendedprice - mm.lo) * 100.0
                                / (mm.hi - mm.lo)), 99) AS BIGINT) AS bin,
               count(*) AS n
        FROM lineitem,
             (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
              FROM lineitem) mm
        GROUP BY bin ORDER BY bin""")),

    // Collection aggregates: per-group sorted value list, serialized to
    // one string so the hash compare sees a scalar (array-typed parquet
    // vs DuckDB LIST compares poorly in pandas). collect_list order is
    // nondeterministic — sort_array makes it canonical; values are
    // integer-cast so string rendering is identical across engines.
    "q_agg_collect" -> GraftQuery(
      run = (s, d) =>
        Tables.nation(s, d)
          .groupBy(col("n_regionkey"))
          .agg(
            concat_ws(",", sort_array(collect_list(col("n_name"))))
              .as("nations"),
            size(collect_set(col("n_name"))).as("n_distinct"))
          .orderBy("n_regionkey"),
      oracle = Some("""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               count(DISTINCT n_name) AS n_distinct
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // Bivariate statistics: sample stddev, correlation, population
    // covariance — partial+final hash aggregates (each is a fold over
    // (Σx, Σy, Σxy, Σx², Σy², n) partials, so shuffle volume is
    // O(groups), not O(rows)). Rounded to 4dp on both sides: the moment
    // sums are FP-order-dependent at the ulp, like avg/cv elsewhere.
    "q_agg_stats" -> GraftQuery(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
            // + 0.0 normalizes signed zero: a tiny negative moment rounds
            // to -0.0 in DuckDB but +0.0 through Spark's BigDecimal round
            // — bit-different under the driver's exact hash compare
            (round(corr(col("l_quantity"), col("l_extendedprice")), 4)
              + lit(0.0)).as("qty_price_corr"),
            (round(covar_pop(col("l_discount"), col("l_tax")), 4)
              + lit(0.0)).as("disc_tax_covar"))
          .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4) AS sd_qty,
               round(corr(l_quantity, l_extendedprice), 4) + 0.0
                 AS qty_price_corr,
               round(covar_pop(l_discount, l_tax), 4) + 0.0
                 AS disc_tax_covar
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Exact interpolated median (seqproc e-value threshold pattern).
    "q_agg_median" -> GraftQuery(
      run = (s, d) =>
        Tables.documents(s, d)
          .groupBy(col("lang"))
          .agg(
            round(median(col("n_chars")), 1).as("median_chars"),
            round(avg(col("n_chars")), 4).as("avg_chars"))
          .orderBy("lang"),
      oracle = Some("""
        SELECT lang, round(median(n_chars), 1) AS median_chars,
               round(avg(n_chars), 4) AS avg_chars
        FROM documents GROUP BY lang ORDER BY lang""")),

    // Group-wise max with ties kept (select_best_models.R:34-35): a window
    // max rather than a self-join — one shuffle instead of two scans+join.
    "q_agg_groupwise_max" -> GraftQuery(
      run = (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
        Tables.orders(s, d)
          .withColumn("mx", max(col("o_totalprice")).over(w))
          .filter(col("o_totalprice") === col("mx"))
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      oracle = Some("""
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM (SELECT o_orderkey, o_orderpriority, o_totalprice,
                     max(o_totalprice) OVER (PARTITION BY o_orderpriority) AS mx
              FROM orders)
        WHERE o_totalprice = mx
        ORDER BY o_orderkey"""))
        ,

    // ------------------------------- custom typed Aggregator: top-k/group
    // The k cheapest orders per priority via graft.functions.CheapestK —
    // a bounded-state Aggregator (O(k) per group, map-side partial
    // aggregation) where the relational form below (the oracle) sorts
    // every partition in full just to keep 3 rows. At 100 TB the window
    // form shuffles and sorts the whole fact table; the Aggregator's
    // exchange carries ≤ k rows per (group, task). Deterministic by the
    // (price, orderkey) total order.
    "q_agg_topk_per_group" -> GraftQuery(
      run = (s, d) => {
        val cheapest = udaf(new graft.functions.CheapestK(3))
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(cheapest(col("o_totalprice"), col("o_orderkey")).as("top"))
          .select(col("o_orderpriority"),
            posexplode(col("top")).as(Seq("pos", "p")))
          .select(col("o_orderpriority"),
            (col("pos") + lit(1L)).as("rank"),
            col("p._1").as("o_totalprice"), col("p._2").as("o_orderkey"))
          .orderBy("o_orderpriority", "rank")
      },
      oracle = Some("""
        SELECT o_orderpriority, rn AS rank, o_totalprice, o_orderkey
        FROM (SELECT o_orderpriority, o_totalprice, o_orderkey,
                     row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice, o_orderkey) AS rn
              FROM orders)
        WHERE rn <= 3 ORDER BY o_orderpriority, rank""")),

    // --------------------------- regression / correlation aggregates
    // Per-nation least-squares fit of order value against customer
    // account balance (slope, intercept, Pearson r) — the built-in
    // moment aggregates (one pass, partial+final, no sort). Rounding
    // absorbs the FP accumulation-order noise of the moment sums.
    "q_agg_regression" -> GraftQuery(
      run = (s, d) =>
        Tables.orders(s, d)
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"),
            round(regr_slope(col("o_totalprice"), col("c_acctbal")), 4)
              .as("slope"),
            round(regr_intercept(col("o_totalprice"), col("c_acctbal")), 4)
              .as("intercept"),
            round(corr(col("o_totalprice"), col("c_acctbal")), 4)
              .as("pearson_r"))
          .orderBy("n_name"),
      oracle = Some("""
        SELECT n_name, count(*) AS n,
               round(regr_slope(o_totalprice, c_acctbal), 4) AS slope,
               round(regr_intercept(o_totalprice, c_acctbal), 4) AS intercept,
               round(corr(o_totalprice, c_acctbal), 4) AS pearson_r
        FROM orders JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // ----------------------------------- deterministic mode (argmax)
    // Most frequent quantity per return flag with a total-order
    // tie-break (highest count, then smallest value) — stated as a
    // partial-aggregable min-of-struct, not a per-group sort, on the
    // Spark side; the oracle states the same order with a window.
    "q_agg_mode" -> GraftQuery(
      run = (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("l_returnflag"))
          .agg(min(struct((-col("c")).as("nc"), col("l_quantity")))
            .as("m"))
          .select(col("l_returnflag"),
            col("m.l_quantity").as("mode_qty"),
            (-col("m.nc")).as("mode_count"))
          .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag, l_quantity AS mode_qty,
               CAST(c AS BIGINT) AS mode_count
        FROM (SELECT l_returnflag, l_quantity, count(*) AS c,
                     row_number() OVER (PARTITION BY l_returnflag
                       ORDER BY count(*) DESC, l_quantity) AS rn
              FROM lineitem GROUP BY l_returnflag, l_quantity)
        WHERE rn = 1 ORDER BY l_returnflag""")),

    // --------------------------- robust outlier screen (median + MAD)
    // Per-group median/MAD outlier counting — the robust alternative to
    // mean±3σ (one wild value moves a mean; it barely moves a median).
    // Everything runs on the integer cents grid and interpolated
    // medians are carried ×2 (an even-count median is k or k+0.5, so
    // 2·median is always an exact integer): the outlier test
    // |x − med| > 3·MAD becomes 2·dev2 > 3·mad4 in pure 64-bit integer
    // arithmetic — no FP boundary anywhere. Two passes over the group
    // (median, then deviations), the unavoidable shape for exact MAD;
    // at 100 TB the first pass would swap in the approx-quantile sketch
    // (q_scale_approx_quantile) with the same downstream algebra.
    "q_agg_outliers" -> GraftQuery(
      run = (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_returnflag"),
          expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)").as("x_c"))
        val med = li.groupBy("l_returnflag")
          .agg(expr("CAST(2.0 * percentile(x_c, 0.5D) AS BIGINT)").as("med2"))
        val dev = li.join(broadcast(med), "l_returnflag")
          .withColumn("dev2", abs(lit(2L) * col("x_c") - col("med2")))
        val mad = dev.groupBy("l_returnflag")
          .agg(expr("CAST(2.0 * percentile(dev2, 0.5D) AS BIGINT)").as("mad4"))
        dev.join(broadcast(mad), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            round(max(col("med2")) / 200.0, 2).as("median_price"),
            round(max(col("mad4")) / 400.0, 2).as("mad"),
            sum(when(lit(2L) * col("dev2") > lit(3L) * col("mad4"), 1L)
              .otherwise(0L)).as("n_outliers"))
          .orderBy("l_returnflag")
      },
      oracle = Some("""
        WITH li AS (SELECT l_returnflag,
                           floor(l_extendedprice * 100.0 + 0.5)::BIGINT AS x_c
                    FROM lineitem),
        med AS (SELECT l_returnflag,
                       CAST(2.0 * median(x_c) AS BIGINT) AS med2
                FROM li GROUP BY 1),
        dev AS (SELECT li.l_returnflag, x_c, med2,
                       abs(2 * x_c - med2) AS dev2
                FROM li JOIN med USING (l_returnflag)),
        mad AS (SELECT l_returnflag,
                       CAST(2.0 * median(dev2) AS BIGINT) AS mad4
                FROM dev GROUP BY 1)
        SELECT dev.l_returnflag, count(*) AS n,
               round(max(med2) / 200.0, 2) AS median_price,
               round(max(mad4) / 400.0, 2) AS mad,
               CAST(sum(CASE WHEN 2 * dev2 > 3 * mad4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM dev JOIN mad USING (l_returnflag)
        GROUP BY 1 ORDER BY 1""")),

    // ------------------------ exact distinct via bitmap words (bit_or)
    // The roaring-bitmap mechanism in relational form: distinct users
    // per event type WITHOUT count_distinct's per-key dedup state —
    // user ids pack 63 per word (word = id div 63, bit = id mod 63;
    // 63 not 64 because a shift into the sign bit overflows DuckDB's
    // checked <<), per (type, word) the words bit_or together (map-side
    // combinable, fixed 8 bytes of state per word regardless of how
    // many rows hit it), and the distinct count is Σ bit_count(word).
    // At 100 TB the shuffle carries one word per (type, word-range,
    // task) — dense id spaces compress ~64× vs shipping ids — and
    // bitmap words UNION across shards by bit_or, the mergeability
    // count_distinct lacks. count_distinct rides along to prove
    // equality on every row.
    "q_agg_bitmap_distinct" -> GraftQuery(
      run = (s, d) =>
        Tables.events(s, d)
          .select(col("event_type"),
            expr("user_id div 63").as("word_idx"),
            expr("shiftleft(1L, CAST(user_id % 63 AS INT))").as("bit"))
          .groupBy("event_type", "word_idx")
          .agg(expr("bit_or(bit)").as("word"),
            countDistinct(col("bit")).as("check_bits"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_words"),
            expr("CAST(sum(bit_count(word)) AS BIGINT)").as("n_distinct"),
            sum(col("check_bits")).as("n_distinct_check"))
          .orderBy("event_type"),
      oracle = Some("""
        WITH b AS (
          SELECT event_type, user_id // 63 AS word_idx,
                 (1::BIGINT << CAST(user_id % 63 AS INT)) AS bit
          FROM events),
        w AS (
          SELECT event_type, word_idx,
                 bit_or(bit) AS word,
                 count(DISTINCT bit) AS check_bits
          FROM b GROUP BY 1, 2)
        SELECT event_type, count(*) AS n_words,
               CAST(sum(bit_count(word)) AS BIGINT) AS n_distinct,
               CAST(sum(check_bits) AS BIGINT) AS n_distinct_check
        FROM w GROUP BY event_type ORDER BY event_type"""))
  )
}

package graft.functions

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function operators (SURVEY.md §2.7).
  *
  * Reference patterns re-expressed:
  *  - partition-key formatting ≙ format_number + regexp_replace
  *    (split_csv_maps_to_slices.py:81-84) and "%.4f"/"_ms<level>" labels
  *    (generate_slice_tensor.py:54-55, 199-205). Done on integer cents —
  *    float printf tie-breaking differs across runtimes, integers don't.
  *  - label split "X_msL" → (value, level) ≙ msproc.py:462-464
  *  - regex strip/extract ≙ seqproc.py:38,53, adjust_mgf_files.py:59-61
  *  - unit conversion / ppm tolerance arithmetic ≙ msproc.py:135-137,
  *    generate_slice_tensor.py:232-233
  *  - cents-int round-trip key ≙ models.py:69-70, 128-133
  *    (uint32(round(v*100)) then "%.2f" re-format)
  *
  * All expressions are built-in Column functions — whole-stage codegen,
  * no UDFs (SURVEY §2.9).
  */
object Scalars extends QueryPack {

  val queries: Map[String, GraftQuery] = Map(
    // Label round-trip: value → cents int key → "%.2f"-style string →
    // split back. Mirrors the reference's swath_start key discipline.
    "q_scalar_format_keys" -> GraftQuery(
      run = (s, d) =>
        Tables.part(s, d)
          .filter(col("p_partkey") <= 200)
          .withColumn("cents", round(col("p_retailprice") * 100.0, 0).cast("long"))
          .withColumn("price_key",
            concat(
              format_string("%d", floor(col("cents") / 100).cast("long")), lit("."),
              format_string("%02d", col("cents") % 100)))
          .withColumn("label",
            concat(col("price_key"), lit("_ms"), col("p_size").cast("string")))
          .withColumn("parsed_level",
            split(col("label"), "_ms").getItem(1).cast("int"))
          .select(col("p_partkey"), col("cents"), col("price_key"),
            col("label"), col("parsed_level"))
          .orderBy("p_partkey"),
      oracle = Some("""
        SELECT p_partkey, cents,
               printf('%d', cents // 100) || '.' || printf('%02d', cents % 100)
                 AS price_key,
               printf('%d', cents // 100) || '.' || printf('%02d', cents % 100)
                 || '_ms' || CAST(p_size AS VARCHAR) AS label,
               p_size AS parsed_level
        FROM (SELECT p_partkey, p_size,
                     CAST(round(p_retailprice * 100.0, 0) AS BIGINT) AS cents
              FROM part WHERE p_partkey <= 200)
        ORDER BY p_partkey""")),

    // Regex extract + replace over semi-structured props strings.
    "q_scalar_regex" -> GraftQuery(
      run = (s, d) =>
        Tables.events(s, d)
          .withColumn("k", regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
            .cast("long"))
          .withColumn("props_clean",
            regexp_replace(col("props"), "[^0-9]", ""))
          .filter(col("event_id") < 500)
          .select(col("event_id"), col("k"), col("props_clean"))
          .orderBy("event_id"),
      oracle = Some("""
        SELECT event_id,
               CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k,
               regexp_replace(props, '[^0-9]', '', 'g') AS props_clean
        FROM events WHERE event_id < 500 ORDER BY event_id""")),

    // String-function battery (beyond ref): edit distance, character
    // translation, delimited-field extraction, padding, reversal — all
    // codegen'd built-ins with engine-identical definitions, exercised
    // over customer names. Integer/string outputs: exact hash compare.
    "q_scalar_strings" -> GraftQuery(
      run = (s, d) =>
        Tables.customer(s, d)
          .filter(col("c_custkey") < 50)
          .select(col("c_custkey"),
            length(col("c_name")).as("name_len"),
            levenshtein(col("c_name"), reverse(col("c_name")))
              .as("lev_to_reverse"),
            translate(col("c_name"), "aeiou", "12345").as("translated"),
            expr("split_part(c_name, '#', 2)").as("num_part"),
            lpad(upper(col("c_name")), 25, "*").as("padded"))
          .orderBy("c_custkey"),
      oracle = Some("""
        SELECT c_custkey, length(c_name) AS name_len,
               levenshtein(c_name, reverse(c_name)) AS lev_to_reverse,
               translate(c_name, 'aeiou', '12345') AS translated,
               split_part(c_name, '#', 2) AS num_part,
               lpad(upper(c_name), 25, '*') AS padded
        FROM customer WHERE c_custkey < 50 ORDER BY c_custkey""")),

    // Arithmetic battery: unit conversion (×60), ppm tolerance, min-max
    // unscale — all plain column arithmetic, identical IEEE semantics.
    "q_scalar_arithmetic" -> GraftQuery(
      run = (s, d) =>
        Tables.events(s, d)
          .filter(col("event_id") < 1000)
          .withColumn("value_seconds", round(col("value") * 60.0, 4))
          .withColumn("ppm_tol", round(col("value") * 40.0 / 1e6, 10))
          .withColumn("clipped", greatest(least(col("value"), lit(100.0)), lit(1.0)))
          .select(col("event_id"), col("value_seconds"), col("ppm_tol"),
            col("clipped"))
          .orderBy("event_id"),
      oracle = Some("""
        SELECT event_id,
               round(value * 60.0, 4) AS value_seconds,
               round(value * 40.0 / 1e6, 10) AS ppm_tol,
               greatest(least(value, 100.0), 1.0) AS clipped
        FROM events WHERE event_id < 1000 ORDER BY event_id""")),

    // Datetime scalar surface: truncation, field extraction, day
    // difference, formatting — all on the orders timestamps (output
    // stays string/integer; raw timestamps never cross the hash compare,
    // see the ns/µs precision trap).
    "q_scalar_datetime" -> GraftQuery(
      run = (s, d) =>
        Tables.orders(s, d)
          .filter(col("o_orderkey") < 500)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            dayofweek(col("o_orderdate")).as("dow"),
            quarter(col("o_orderdate")).as("q"),
            date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
              .as("month_start"),
            datediff(col("o_orderdate"),
              lit("1995-01-01").cast("timestamp")).as("days_since_epoch_start"))
          .orderBy("o_orderkey"),
      oracle = Some("""
        SELECT o_orderkey,
               CAST(extract(year FROM o_orderdate) AS INT) AS y,
               CAST(extract(month FROM o_orderdate) AS INT) AS m,
               CAST(extract(dow FROM o_orderdate) + 1 AS INT) AS dow,
               CAST(extract(quarter FROM o_orderdate) AS INT) AS q,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
                 AS month_start,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
                    AS INT) AS days_since_epoch_start
        FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""")),

    // Conditional remap (RT-unit branch + case routing).
    "q_scalar_case_route" -> GraftQuery(
      run = (s, d) =>
        Tables.events(s, d)
          .withColumn("weight",
            when(col("event_type") === "purchase", col("value") * 10.0)
              .when(col("event_type") === "click", col("value") * 2.0)
              .otherwise(col("value")))
          .groupBy(col("event_type"))
          .agg(round(sum(col("weight")), 4).as("weighted_sum"))
          .orderBy("event_type"),
      oracle = Some("""
        SELECT event_type,
               round(sum(CASE WHEN event_type = 'purchase' THEN value * 10.0
                              WHEN event_type = 'click' THEN value * 2.0
                              ELSE value END), 4) AS weighted_sum
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ----------------------------- array-function battery (§2.7 breadth)
    // Spark array HOFs vs DuckDB list functions over the embedding
    // vectors: slice, sort, extrema, sequential fold (identical
    // element order on both sides → identical FP), filtered count.
    // The top-3 column is emitted as a joined STRING: the gate sorts
    // result rows by every column, and array cells are unsortable
    // there (same convention as q_agg_collect).
    "q_scalar_arrays" -> GraftQuery(
      run = (s, d) =>
        Tables.embeddings(s, d)
          .filter(col("vec_id") < 100)
          .select(col("vec_id"),
            expr("slice(transform(embedding, x -> CAST(x AS DOUBLE)), 1, 8)")
              .as("a"))
          .select(col("vec_id"),
            size(col("a")).as("n"),
            round(array_max(col("a")), 4).as("mx"),
            round(array_min(col("a")), 4).as("mn"),
            round(expr("aggregate(a, 0D, (acc, x) -> acc + x)"), 4).as("s"),
            size(expr("filter(a, x -> x > 0)")).as("n_pos"),
            // 1e4 integer grid, THEN stringify: casting a rounded DOUBLE
            // to string renders scientific notation in Spark ("5.0E-5")
            // but decimal in DuckDB ("0.00005") — integer strings are
            // format-identical everywhere
            expr("array_join(transform(slice(sort_array(a, false), 1, 3), " +
              "x -> CAST(CAST(round(x * 10000, 0) AS BIGINT) AS STRING)), " +
              "'|')").as("top3_e4"))
          .orderBy("vec_id"),
      oracle = Some("""
        SELECT vec_id, len(a) AS n,
               round(list_max(a), 4) AS mx,
               round(list_min(a), 4) AS mn,
               round(list_sum(a), 4) AS s,
               len(list_filter(a, x -> x > 0)) AS n_pos,
               list_aggregate(list_transform(list_reverse_sort(a)[1:3],
                 x -> CAST(CAST(round(x * 10000) AS BIGINT) AS VARCHAR)),
                 'string_agg', '|') AS top3_e4
        FROM (SELECT vec_id,
                     list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))
                       AS a
              FROM embeddings WHERE vec_id < 100)
        ORDER BY vec_id"""))
  )
}

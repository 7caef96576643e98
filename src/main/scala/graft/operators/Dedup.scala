package graft.operators

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Five strategies over the `documents` / `embeddings` tables, each the
  * standard algorithm used for web-scale corpus dedup:
  *
  *  - exact:        hash-groupBy on md5(text) — the shuffle key is the
  *                  32-char digest, never the document body, so at 100 TB
  *                  the exchange carries ~48 bytes/doc.
  *  - n-gram Jaccard: word-3-shingle inverted-index join; quadratic in
  *                  the worst case, kept as the exact-verification kernel
  *                  that the LSH variants feed their candidates into.
  *  - MinHash+LSH:  16 md5-derived min-hashes per doc computed map-side
  *                  with array transforms (NO shuffle to build
  *                  signatures), banded 4×4; only the tiny
  *                  (band, key) → candidate-pair join shuffles.
  *  - SimHash:      32-bit count-weighted signature; byte-banded
  *                  candidate generation (pigeonhole: hamming ≤ 3 ⇒ one
  *                  of 4 bytes equal), popcount(xor) verification.
  *  - embedding cosine: pairwise near-dup over `Array[Float]` vectors;
  *                  brute block here, LSH-bucketed variant in
  *                  [[Similarity]] is the scale path.
  *
  * All hash functions are md5-derived (`conv(substr(md5(x),1,8),16,10)`)
  * so the DuckDB oracle computes the IDENTICAL signature — LSH candidate
  * sets match across engines bit-for-bit, making even the probabilistic
  * operators hash-checkable, not just rows-only.
  */
object Dedup extends QueryPack {

  /** doc_id + distinct word-3-gram shingle set, built with array
    * transforms only — per-row, map-side, no window/shuffle. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .withColumn(
        "sh",
        when(size(col("ws")) >= 3,
          expr("transform(sequence(0, size(ws)-3), " +
            "i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))"))
          .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))
      .select(col("doc_id"), explode(array_distinct(col("sh"))).as("s"))

  /** DuckDB mirror of [[shingles]] (window-function formulation —
    * semantically identical shingle set). */
  private val shinglesCte = """
    shingles AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS s
        FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w,
                     generate_subscripts(string_split(text,' '),1) AS i
              FROM documents)
        WINDOW win AS (PARTITION BY doc_id ORDER BY i))
      WHERE s IS NOT NULL)"""

  /** 32-bit unsigned int from the first 8 hex chars of md5 — identical in
    * Spark (`conv`) and DuckDB (`('0x'||…)::BIGINT`). */
  private def md5h(e: String): String =
    s"CAST(conv(substr(md5($e), 1, 8), 16, 10) AS BIGINT)"

  private val jaccardVerifySql = """
    ns AS (SELECT doc_id, count(*) AS nsh FROM shingles GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
      FROM cand JOIN shingles a ON a.doc_id = cand.d1
                JOIN shingles b ON b.doc_id = cand.d2 AND b.s = a.s
      GROUP BY 1, 2)"""

  /** Exact Jaccard over the shingle sets of candidate pairs (d1, d2). */
  private def jaccardVerify(sh: DataFrame, cand: DataFrame): DataFrame = {
    val ns = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    cand
      .join(sh.as("a"), col("a.doc_id") === col("d1"))
      .join(sh.as("b"), col("b.doc_id") === col("d2") && col("b.s") === col("a.s"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("c"))
      .join(ns.as("na"), col("na.doc_id") === col("d1"))
      .join(ns.as("nb"), col("nb.doc_id") === col("d2"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("na.nsh") + col("nb.nsh") - col("c")))
  }

  val queries: Map[String, GraftQuery] = Map(

    // ---------------------------------------------------------------- exact
    "q_dedup_exact" -> GraftQuery(
      run = (s, d) =>
        Tables.documents(s, d)
          .groupBy(md5(col("text")).as("text_hash"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy("keep_id"),
      oracle = Some("""
        SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
               count(*) AS n_copies
        FROM documents GROUP BY md5(text) ORDER BY keep_id""")),

    // ------------------------------------------------- exact n-gram Jaccard
    // Inverted-index join on shared shingles; threshold 0.5.
    "q_dedup_ngram_jaccard" -> GraftQuery(
      run = (s, d) => {
        val sh = shingles(s, d)
        val cand = sh.as("x").join(sh.as("y"),
            col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .distinct()
        jaccardVerify(sh, cand)
          .filter(col("jaccard") >= 0.5)
          .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("d1", "d2")
      },
      oracle = Some(s"""
        WITH $shinglesCte,
        cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
                 FROM shingles a JOIN shingles b
                   ON a.s = b.s AND a.doc_id < b.doc_id),
        $jaccardVerifySql
        SELECT d1, d2,
               round(CAST(c AS DOUBLE)/(na.nsh + nb.nsh - c), 6) AS jaccard
        FROM common JOIN ns na ON na.doc_id = d1 JOIN ns nb ON nb.doc_id = d2
        WHERE CAST(c AS DOUBLE)/(na.nsh + nb.nsh - c) >= 0.5
        ORDER BY d1, d2""")),

    // ---------------------------------------------------------- MinHash+LSH
    // Signatures are built per-row with array ops (no shuffle); only the
    // banded candidate join and the verification of the (few) candidates
    // touch the network. 16 hashes, 4 bands × 4 rows.
    "q_dedup_minhash_lsh" -> GraftQuery(
      run = (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("ws", split(col("text"), " "))
          .withColumn(
            "sh",
            when(size(col("ws")) >= 3,
              expr("transform(sequence(0, size(ws)-3), " +
                "i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))"))
              .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))
          .withColumn("dsh", array_distinct(col("sh")))
        // minhash_i = min over shingles of md5h(i || '|' || shingle)
        val withSig = (0 until 16).foldLeft(docs) { (df, i) =>
          df.withColumn(s"h$i",
            expr(s"array_min(transform(dsh, s -> ${md5h(s"concat('$i', '|', s)")}))"))
        }
        val bandCols = (0 until 4).map { b =>
          struct(lit(b).as("band"),
            concat_ws(",", (0 until 4).map(r => col(s"h${4 * b + r}")): _*)
              .as("key"))
        }
        val bands = withSig
          .filter(col("h0").isNotNull)
          .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
          .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
        val cand = bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .distinct()
        jaccardVerify(shingles(s, d), cand)
          .filter(col("jaccard") >= 0.5)
          .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("d1", "d2")
      },
      oracle = Some(s"""
        WITH $shinglesCte,
        mh AS (SELECT doc_id, seed,
                      min(('0x'||substr(md5(seed::VARCHAR || '|' || s),1,8))::BIGINT) AS h
               FROM shingles, generate_series(0,15) t(seed)
               GROUP BY doc_id, seed),
        bands AS (SELECT doc_id, seed//4 AS band,
                         string_agg(h::VARCHAR, ',' ORDER BY seed) AS key
                  FROM mh GROUP BY doc_id, seed//4),
        cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        $jaccardVerifySql
        SELECT d1, d2,
               round(CAST(c AS DOUBLE)/(na.nsh + nb.nsh - c), 6) AS jaccard
        FROM common JOIN ns na ON na.doc_id = d1 JOIN ns nb ON nb.doc_id = d2
        WHERE CAST(c AS DOUBLE)/(na.nsh + nb.nsh - c) >= 0.5
        ORDER BY d1, d2""")),

    // -------------------------------------------------------------- SimHash
    // 32-bit count-weighted simhash; candidates share ≥1 of 4 bytes
    // (full recall for hamming ≤ 3); verified with popcount(xor).
    "q_dedup_simhash" -> GraftQuery(
      run = (s, d) => {
        val wc = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
          .withColumn("h", expr(md5h("w")))
        val bitSums = (0 until 32).map(j =>
          sum(when(expr(s"(shiftright(h, $j) & 1) = 1"), col("cnt"))
            .otherwise(-col("cnt"))).as(s"b$j"))
        val sig = wc.groupBy("doc_id")
          .agg(bitSums.head, bitSums.tail: _*)
          .select(col("doc_id"),
            (0 until 32).map(j =>
              when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
              .reduce(_ + _).as("sig"))
        val bytes = sig.select(col("doc_id"), col("sig"),
          explode(array((0 until 4).map(k =>
            struct(lit(k).as("k"),
              expr(s"shiftright(sig, ${8 * k}) & 255").as("byte"))): _*)).as("kb"))
          .select(col("doc_id"), col("sig"), col("kb.k").as("k"), col("kb.byte").as("byte"))
        bytes.as("x").join(bytes.as("y"),
            col("x.k") === col("y.k") && col("x.byte") === col("y.byte") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
            expr("bit_count(x.sig ^ y.sig)").as("hamming"))
          .distinct()
          .filter(col("hamming") <= 3)
          .orderBy("d1", "d2")
      },
      oracle = Some("""
        WITH wc AS (
          SELECT doc_id, w, count(*) AS cnt FROM (
            SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
          WHERE w <> '' GROUP BY doc_id, w),
        wh AS (SELECT doc_id, cnt,
                      ('0x'||substr(md5(w),1,8))::BIGINT AS h FROM wc),
        bitsum AS (
          SELECT doc_id, j,
                 sum(CASE WHEN (h >> j) & 1 = 1 THEN cnt ELSE -cnt END) AS bs
          FROM wh, generate_series(0,31) t(j) GROUP BY doc_id, j),
        sig AS (
          SELECT doc_id,
                 sum(CASE WHEN bs > 0 THEN (1::BIGINT << j) ELSE 0 END) AS sig
          FROM bitsum GROUP BY doc_id),
        bytes AS (
          SELECT doc_id, sig, k, (sig >> (8*k)) & 255 AS byte
          FROM sig, generate_series(0,3) t(k)),
        pairs AS (
          SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                 bit_count(xor(a.sig, b.sig)) AS hamming
          FROM bytes a JOIN bytes b
            ON a.k = b.k AND a.byte = b.byte AND a.doc_id < b.doc_id)
        SELECT d1, d2, hamming FROM pairs WHERE hamming <= 3
        ORDER BY d1, d2""")),

    // ---------------------------------------------- embedding-cosine near-dup
    // Brute pairwise block over the vector table; at scale the candidate
    // set comes from LSH bucketing (see Similarity pack) and only
    // bucket-mates reach this exact kernel.
    "q_dedup_embedding" -> GraftQuery(
      run = (s, d) => {
        val e = Tables.embeddings(s, d).select(col("vec_id"),
            expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
          .withColumn("nrm", expr("sqrt(aggregate(v, 0D, (a, x) -> a + x*x))"))
        e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
          .withColumn("cosine",
            expr("aggregate(zip_with(a.v, b.v, (x, y) -> x*y), 0D, (a, x) -> a + x)") /
              (col("a.nrm") * col("b.nrm")))
          .filter(col("cosine") >= 0.4)
          .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
            round(col("cosine"), 4).as("cosine"))
          .orderBy("v1", "v2")
      },
      oracle = Some("""
        WITH u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                          generate_subscripts(embedding,1) AS i FROM embeddings),
        nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM u GROUP BY vec_id),
        dots AS (SELECT a.vec_id AS v1, b.vec_id AS v2, sum(a.x*b.x) AS dot
                 FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
                 GROUP BY 1, 2)
        SELECT v1, v2, round(dot/(na.nrm*nb.nrm), 4) AS cosine
        FROM dots JOIN nrm na ON na.vec_id = v1 JOIN nrm nb ON nb.vec_id = v2
        WHERE dot/(na.nrm*nb.nrm) >= 0.4
        ORDER BY v1, v2"""))
  )
}

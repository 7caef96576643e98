package graft.operators

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One opaque media payload: the engine's multimodal row shape. */
final case class MediaRow(doc_id: Long, content: Array[Byte])

/** Batch-extracted features for one payload. */
final case class MediaFeatures(
    doc_id: Long, n_bytes: Int, mean_byte: Double, max_byte: Int,
    entropy: Double)

/** Multimodal-column operators: image/audio/video as opaque `BINARY`
  * columns with typed metadata, processed by byte-level expressions or a
  * batched `mapPartitions` kernel (the Scala/`Dataset` analog of
  * `mapInPandas` — rows are consumed in fixed-size batches so a real
  * decoder could amortize library setup per batch exactly like an Arrow
  * batch UDF).
  *
  * STUB NOTE: this container has no image/audio codecs, so "decode" is a
  * deterministic fake — payloads are synthesized as
  * `unhex(repeat(md5(text), 8))` (128 bytes) and the "header" fields are
  * derived from the leading bytes. The Spark-side plumbing — binary
  * schema, metadata struct, batch shape, partitioning — is real; swap
  * [[Multimodal.decodeBatch]] for a codec call (e.g. javax.imageio /
  * ffmpeg bindings) to process real media. No row ever leaves the
  * executor: payload bytes stay columnar and map-side; only extracted
  * (small) features shuffle.
  */
object Multimodal extends QueryPack {

  /** Deterministic fake media table: doc_id + 128-byte payload. */
  private def synth(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        unhex(repeat(md5(col("text")), 8)).as("blob"))

  /** DuckDB mirror works on the hex string (no BLOB substr in 1.0):
    * byte k of the payload = hex chars [2k-1, 2k]. */
  private val synthCte = """
    media AS (SELECT doc_id, source, repeat(md5(text), 8) AS hx
              FROM documents)"""

  /** byte k (1-based) of a blob as BIGINT — Spark syntax. */
  private def byteAt(blob: String, pos: String): String =
    s"CAST(conv(hex(substring($blob, $pos, 1)), 16, 10) AS BIGINT)"

  /** Same, DuckDB syntax over the hex string (pos is a 1-based byte). */
  private def byteAtDuck(pos: String): String =
    s"('0x'||substr(hx, 2*($pos) - 1, 2))::BIGINT"

  /** The batch kernel: replace the body with a real codec for real media.
    * Runs once per 64-row batch, mirroring an Arrow-batch UDF. Entropy
    * terms p·ln(p) are quantized to a 1e-12 integer grid and summed as
    * Longs — integer addition is order-independent, so the oracle's
    * hash aggregate (arbitrary summation order) lands on the identical
    * value instead of differing by an ulp at a rounding boundary. */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val bytes = r.content.map(_ & 0xff)
      val n = bytes.length
      val hist = new Array[Int](256)
      bytes.foreach(b => hist(b) += 1)
      var s = 0L
      hist.foreach { c =>
        if (c > 0) {
          val p = c.toDouble / n
          s += math.floor(p * math.log(p) * 1e12 + 0.5).toLong
        }
      }
      val entropy = -(s.toDouble / 1e12) / math.log(2.0)
      MediaFeatures(r.doc_id, n, bytes.sum.toDouble / n, bytes.max, entropy)
    }

  /** Frame-fingerprint document-frequency ceiling — the frame-leg twin
    * of [[Dedup.MaxShingleDf]]. A fingerprint shared by more docs than
    * this (a black frame, an intro card) carries no near-dup signal and
    * its posting list would emit O(df²) pairs; dropping it bounds pair
    * emission per bucket at maxDf² regardless of corpus size. */
  private[operators] val MaxFrameSigDf = 1000

  /** Synthetic "video": 8 frames of 16 bytes, frame f = md5 digest of
    * the 32-char text window starting at 32f. Near-dup documents (the
    * corpus' shared-prefix docs) therefore share the frames covering
    * their common windows — fingerprint collisions carry SIGNAL (same
    * underlying content), not hash-fold load. `n_frames` counts only
    * full windows so a short doc never emits the padded-tail digest
    * every other short doc would also emit. */
  private def vsynth(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      unhex(concat((0 until 8).map(f =>
        md5(substring(col("text"), 1 + 32 * f, 32))): _*)).as("vblob"),
      least(floor(col("n_chars") / 32), lit(8)).cast("int").as("n_frames"))

  /** Distinct (doc_id, sig) frame fingerprints: the full 32-bit leading
    * word of each frame's digest, read back out of the binary payload.
    * No modulus fold — a 1024-value space would make every bucket hold
    * n/1024 docs at corpus scale (O(n²/1024) pairs); in the full 32-bit
    * space equal signatures mean equal frames. */
  private[operators] def frameSignatures(s: SparkSession, d: String): DataFrame =
    vsynth(s, d)
      .select(col("doc_id"), col("n_frames"), col("vblob"),
        explode(sequence(lit(0), lit(7))).as("f"))
      .filter(col("f") < col("n_frames"))
      .select(col("doc_id"),
        expr("CAST(conv(hex(substring(vblob, 1 + 16*f, 4)), 16, 10) " +
          "AS BIGINT)").as("sig"))
      .distinct()

  /** STATELESS per-row form of [[frameSignatures]] for streaming inputs:
    * the distinct signature set is built inside one array expression
    * (filter → transform → array_distinct → explode_outer), so no
    * stateful `distinct` operator is needed on a stream and a doc with
    * zero full frames still emits one (doc_id, null) row. Values are
    * identical to the blob-side extraction — the 32-bit signature IS
    * the leading word of the frame digest either way. */
  private[graft] def frameSigRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode_outer(expr(
        "array_distinct(transform(" +
          "filter(sequence(0, 7), f -> n_chars >= 32*(f+1)), " +
          "f -> CAST(conv(substr(md5(substring(text, 1 + 32*f, 32)), " +
          "1, 8), 16, 10) AS BIGINT)))")).as("sig"))

  /** Candidate pairs (d1 < d2, n_shared) from an inverted index on the
    * frame fingerprint, mirroring [[Dedup.pairCounts]]: the hot set
    * (df > maxDf) is removed by broadcast anti-join before any pair
    * forms, and the typed pair generator re-checks the bound, so
    * per-bucket emission is provably ≤ maxDf² even if a popular
    * fingerprint dominates the corpus. Only (doc_id, sig) pairs ever
    * shuffle — frame bytes stay in the scan stage. */
  private[operators] def framePairs(
      s: SparkSession, sigs: DataFrame,
      maxDf: Int = MaxFrameSigDf): DataFrame = {
    import s.implicits._
    val hot = sigs.groupBy("sig").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("sig")
    val capped = sigs.join(broadcast(hot), Seq("sig"), "left_anti")
    capped.select(col("doc_id"), col("sig")).as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (_, it) =>
        val ids = it.map(_._1).toArray
        if (ids.length > maxDf) Iterator.empty // hard bound; hot set is gone
        else {
          java.util.Arrays.sort(ids)
          for { i <- ids.indices.iterator; j <- (i + 1) until ids.length }
            yield (ids(i), ids(j))
        }
      }
      .toDF("d1", "d2")
      .groupBy("d1", "d2").agg(count(lit(1)).as("n_shared"))
  }

  /** DuckDB mirror of signatures → capped stream → pairs (n_shared≥2). */
  private val vpairsCte = s"""
    vsigs AS (
      SELECT DISTINCT doc_id,
             ('0x'||substr(md5(substr(text, 1 + 32*f, 32)), 1, 8))::BIGINT
               AS sig
      FROM documents, generate_series(0, 7) t(f)
      WHERE n_chars >= 32*(f+1)),
    vhot AS (SELECT sig FROM vsigs GROUP BY sig
             HAVING count(*) > $MaxFrameSigDf),
    vsc AS (SELECT doc_id, sig FROM vsigs
            WHERE sig NOT IN (SELECT sig FROM vhot)),
    vpairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
               FROM vsc a JOIN vsc b
                 ON a.sig = b.sig AND a.doc_id < b.doc_id
               GROUP BY 1, 2 HAVING count(*) >= 2)"""

  val queries: Map[String, GraftQuery] = Map(

    // ---------------------------------------------- header decode → metadata
    // Fake-header parse with native byte expressions (fully codegen'd).
    "q_mm_decode_meta" -> GraftQuery(
      run = (s, d) =>
        synth(s, d).select(
          col("doc_id"),
          octet_length(col("blob")).as("n_bytes"),
          expr(s"16 + ${byteAt("blob", "1")} % 64").as("width"),
          expr(s"16 + ${byteAt("blob", "2")} % 64").as("height"),
          expr(s"1 + ${byteAt("blob", "3")} % 8").as("n_frames"),
          expr(s"CASE ${byteAt("blob", "4")} % 3 WHEN 0 THEN 'image' " +
            "WHEN 1 THEN 'audio' ELSE 'video' END").as("media_type"))
          .orderBy("doc_id"),
      oracle = Some(s"""
        WITH $synthCte
        SELECT doc_id, length(hx) // 2 AS n_bytes,
               16 + ${byteAtDuck("1")} % 64 AS width,
               16 + ${byteAtDuck("2")} % 64 AS height,
               1 + ${byteAtDuck("3")} % 8 AS n_frames,
               CASE ${byteAtDuck("4")} % 3 WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS media_type
        FROM media ORDER BY doc_id""")),

    // --------------------------------------------------------- frame sampling
    // Payload = 8 frames × 16 bytes; keep every 2nd frame.
    "q_mm_frame_sample" -> GraftQuery(
      run = (s, d) =>
        synth(s, d)
          .select(col("doc_id"), col("blob"),
            explode(sequence(lit(0), lit(7))).as("frame_idx"))
          .filter(col("frame_idx") % 2 === 0)
          .select(col("doc_id"), col("frame_idx"),
            expr("hex(substring(blob, 1 + 16*frame_idx, 16))").as("frame_hex"))
          .orderBy("doc_id", "frame_idx"),
      oracle = Some(s"""
        WITH $synthCte
        SELECT doc_id, frame_idx,
               upper(substr(hx, 1 + 32*frame_idx, 32)) AS frame_hex
        FROM media, generate_series(0,7) t(frame_idx)
        WHERE frame_idx % 2 = 0
        ORDER BY doc_id, frame_idx""")),

    // ------------------------------------------------------- resize (pooling)
    // Average-pool 128 bytes → 32 buckets of 4 ("thumbnail"). Typed
    // kernel: one JIT loop over the byte array beats 128 hex/conv
    // expressions per row.
    "q_mm_resize_pool" -> GraftQuery(
      run = (s, d) => {
        import s.implicits._
        synth(s, d).select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
          .map { case (id, b) =>
            val sb = new StringBuilder
            var i = 0
            while (i < 32) {
              val v = ((b(4 * i) & 0xff) + (b(4 * i + 1) & 0xff) +
                (b(4 * i + 2) & 0xff) + (b(4 * i + 3) & 0xff)) / 4
              if (i > 0) sb += ','
              sb.append(v)
              i += 1
            }
            (id, sb.toString)
          }
          .toDF("doc_id", "pooled")
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH $synthCte
        SELECT doc_id,
               string_agg(((${byteAtDuck("1 + 4*i")} +
                            ${byteAtDuck("2 + 4*i")} +
                            ${byteAtDuck("3 + 4*i")} +
                            ${byteAtDuck("4 + 4*i")}) // 4)::VARCHAR,
                          ',' ORDER BY i) AS pooled
        FROM media, generate_series(0,31) t(i)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------- perceptual-hash bucketing
    // Image near-dup detection shape: a 32-bit average-hash over the
    // payload (bit i = byte_i > mean byte), then bucket by hash — docs
    // sharing a phash are near-dup candidates. All-integer bit
    // construction (mean = sum/32 is exact: /2⁵), so buckets are
    // bit-identical across engines; the hash join key is 8 bytes/doc.
    "q_mm_phash" -> GraftQuery(
      run = (s, d) => {
        import s.implicits._
        synth(s, d).select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
          .map { case (id, b) =>
            var sum = 0L
            var i = 0
            while (i < 32) { sum += (b(i) & 0xff); i += 1 }
            val mean = sum.toDouble / 32.0
            var h = 0L
            i = 0
            while (i < 32) {
              if ((b(i) & 0xff) > mean) h |= 1L << i
              i += 1
            }
            (id, h)
          }
          .toDF("doc_id", "phash")
          .withColumn("n_same_hash",
            count(lit(1)).over(
              org.apache.spark.sql.expressions.Window.partitionBy("phash")))
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH $synthCte,
        b AS (SELECT doc_id, i, ${byteAtDuck("i")} AS v
              FROM media, generate_series(1, 32) t(i)),
        m AS (SELECT doc_id, CAST(sum(v) AS DOUBLE) / 32.0 AS mean
              FROM b GROUP BY doc_id),
        h AS (SELECT b.doc_id AS doc_id,
                     CAST(sum(CASE WHEN v > mean THEN (1::BIGINT << (i - 1))
                              ELSE 0 END) AS BIGINT) AS phash
              FROM b JOIN m ON m.doc_id = b.doc_id
              GROUP BY b.doc_id)
        SELECT doc_id, phash,
               count(*) OVER (PARTITION BY phash) AS n_same_hash
        FROM h ORDER BY doc_id""")),

    // ----------------------------------- batched feature extraction (kernel)
    // The genuine custom-kernel path: typed Dataset → mapPartitions in
    // 64-row batches (this is where a real codec would run). The fake
    // codec's byte statistics ARE SQL-expressible over the hex string,
    // so the kernel carries a full DuckDB oracle: histogram entropy,
    // mean/max byte — hash-checked, not rows-only.
    "q_mm_features" -> GraftQuery(
      run = (s, d) => {
        import s.implicits._
        synth(s, d).select(col("doc_id"), col("blob").as("content"))
          .as[MediaRow]
          .mapPartitions(it => it.grouped(64).flatMap(decodeBatch))
          .toDF()
          .select(col("doc_id"), col("n_bytes"),
            round(col("mean_byte"), 4).as("mean_byte"), col("max_byte"),
            round(col("entropy"), 4).as("entropy"))
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH $synthCte,
        b AS (SELECT doc_id, ${byteAtDuck("i")} AS v
              FROM media, generate_series(1, 128) t(i)),
        hist AS (SELECT doc_id, v, count(*) AS c FROM b GROUP BY doc_id, v),
        tot AS (SELECT doc_id, CAST(count(*) AS INT) AS n_bytes,
                       avg(v) AS mean_v, CAST(max(v) AS INT) AS max_v
                FROM b GROUP BY doc_id)
        SELECT h.doc_id, t.n_bytes, round(t.mean_v, 4) AS mean_byte,
               t.max_v AS max_byte,
               round(-(CAST(sum(floor((c::DOUBLE / t.n_bytes)
                                      * ln(c::DOUBLE / t.n_bytes)
                                      * 1000000000000.0 + 0.5)::BIGINT)
                       AS DOUBLE) / 1000000000000.0)
                     / ln(2.0::DOUBLE), 4) AS entropy
        FROM hist h JOIN tot t ON t.doc_id = h.doc_id
        GROUP BY h.doc_id, t.n_bytes, t.mean_v, t.max_v
        ORDER BY h.doc_id""")),

    // ------------------------------------- video near-dup (frame overlap)
    // The standard video-dedup shape: per-frame fingerprints → inverted
    // index on fingerprint → candidate pairs by shared-frame count.
    // Fingerprint = the full 32-bit leading word of each frame digest
    // (no modulus fold — collisions mean equal frames, i.e. signal),
    // and the posting list is df-capped before pair emission exactly
    // like the shingle kernel, so a popular fingerprint can never
    // trigger the O(n²/buckets) blow-up. Only (doc_id, sig) rows
    // shuffle — frame bytes stay in the scan stage.
    "q_mm_video_neardup" -> GraftQuery(
      run = (s, d) =>
        framePairs(s, frameSignatures(s, d))
          .filter(col("n_shared") >= 2)
          .orderBy("d1", "d2"),
      oracle = Some(s"""
        WITH $vpairsCte
        SELECT d1, d2, n_shared FROM vpairs
        ORDER BY d1, d2""")),

    // ------------------------------- scene-cut detection (frame deltas)
    // The video-curation primitive between sampling and near-dup:
    // per-pair inter-frame delta energy (Σ |byte_i(f) − byte_i(f−1)|
    // over the 16 frame bytes) thresholded into cuts — the shot-boundary
    // signal that decides which frames are worth captioning/embedding.
    // All-integer byte arithmetic over the binary payload; the exploded
    // (doc, frame, byte) stream stays map-side until the per-doc
    // aggregate, so only per-doc summaries shuffle. Docs with fewer
    // than 2 full frames report zero pairs.
    "q_mm_frame_delta" -> GraftQuery(
      run = (s, d) => {
        val CutThreshold = 800L
        val deltas = vsynth(s, d)
          .select(col("doc_id"), col("n_frames"), col("vblob"),
            explode(sequence(lit(1), lit(7))).as("f"))
          .filter(col("f") < col("n_frames"))
          .select(col("doc_id"), col("f"),
            explode(sequence(lit(0), lit(15))).as("i"),
            col("vblob"))
          .select(col("doc_id"), col("f"),
            abs(expr(byteAt("vblob", "16*f + i + 1")) -
              expr(byteAt("vblob", "16*(f-1) + i + 1"))).as("db"))
          .groupBy("doc_id", "f")
          .agg(sum(col("db")).as("delta"))
        val per = deltas.groupBy("doc_id")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("delta") > CutThreshold, 1L).otherwise(0L))
              .as("n_cuts"),
            max(col("delta")).as("max_delta"),
            expr("(sum(delta) * 1000) div count(1)").as("mean_delta_milli"))
        vsynth(s, d).select(col("doc_id"))
          .join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
            coalesce(col("n_cuts"), lit(0L)).as("n_cuts"),
            coalesce(col("max_delta"), lit(0L)).as("max_delta"),
            coalesce(col("mean_delta_milli"), lit(0L))
              .as("mean_delta_milli"))
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH fb AS (
          SELECT doc_id, f, i,
                 ('0x'||substr(md5(substr(text, 1 + 32*f, 32)),
                               2*i + 1, 2))::BIGINT AS b
          FROM documents, generate_series(0, 7) tf(f),
               generate_series(0, 15) ti(i)
          WHERE n_chars >= 32*(f+1)),
        dl AS (
          SELECT a.doc_id AS doc_id, a.f AS f,
                 CAST(sum(abs(a.b - p.b)) AS BIGINT) AS delta
          FROM fb a JOIN fb p ON p.doc_id = a.doc_id AND p.i = a.i
                             AND p.f = a.f - 1
          GROUP BY 1, 2),
        per AS (
          SELECT doc_id, count(*) AS n_pairs,
                 sum(CASE WHEN delta > 800 THEN 1 ELSE 0 END) AS n_cuts,
                 max(delta) AS max_delta,
                 (sum(delta) * 1000) // count(*) AS mean_delta_milli
          FROM dl GROUP BY 1)
        SELECT d.doc_id,
               CAST(coalesce(per.n_pairs, 0) AS BIGINT) AS n_pairs,
               CAST(coalesce(per.n_cuts, 0) AS BIGINT) AS n_cuts,
               CAST(coalesce(per.max_delta, 0) AS BIGINT) AS max_delta,
               CAST(coalesce(per.mean_delta_milli, 0) AS BIGINT)
                 AS mean_delta_milli
        FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // --------------------- audio energy segmentation (VAD shape)
    // The audio-curation primitive: decode PCM, compute per-frame
    // energy, threshold into voiced/unvoiced, and merge voiced runs
    // into segments (the voice-activity-detection shape that gates
    // "does this clip contain speech at all" and yields the segment
    // table a transcription stage consumes). The 128-byte payload
    // reads as 64 unsigned 16-bit samples → 8 frames of 8 samples;
    // energy = Σ s² per frame (exact Long), voiced = energy above the
    // half-scale threshold, segments via gaps-and-islands. Per doc
    // only (frame, energy) rows shuffle — with a real decoder the
    // PCM stays executor-side exactly like the other kernels here.
    "q_mm_audio_vad" -> GraftQuery(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val thresh = 8L * 32768L * 32768L
        val frames = synth(s, d)
          .select(col("doc_id"), col("blob"),
            explode(expr("sequence(0, 63)")).as("k"))
          .select(col("doc_id"), expr("k div 8").as("f"),
            (expr(byteAt("blob", "2*k + 1")) * 256L +
              expr(byteAt("blob", "2*k + 2"))).as("smp"))
          .groupBy("doc_id", "f")
          .agg(sum(col("smp") * col("smp")).as("energy"))
          .withColumn("voiced", (col("energy") > thresh).cast("int"))
        val runs = frames.filter(col("voiced") === 1)
          .withColumn("run_id", col("f") - row_number().over(
            Window.partitionBy("doc_id").orderBy("f")))
          .groupBy("doc_id", "run_id")
          .agg(count(lit(1)).as("run_len"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_segments"), max(col("run_len")).as("max_run"))
        frames.groupBy("doc_id")
          .agg(sum(col("voiced").cast("long")).as("n_voiced"))
          .join(runs, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_voiced"),
            coalesce(col("n_segments"), lit(0L)).as("n_segments"),
            coalesce(col("max_run"), lit(0L)).as("max_run"))
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH $synthCte,
        smp AS (SELECT doc_id, k // 8 AS f,
                       ${byteAtDuck("2*k + 1")} * 256 +
                         ${byteAtDuck("2*k + 2")} AS smp
                FROM media, generate_series(0, 63) t(k)),
        fr AS (SELECT doc_id, f, CAST(sum(smp*smp) AS BIGINT) AS energy
               FROM smp GROUP BY 1, 2),
        v AS (SELECT doc_id, f,
                     CASE WHEN energy > 8589934592 THEN 1 ELSE 0 END
                       AS voiced
              FROM fr),
        runs AS (SELECT doc_id,
                        f - row_number() OVER (PARTITION BY doc_id
                                               ORDER BY f) AS run_id
                 FROM v WHERE voiced = 1),
        seg AS (SELECT doc_id, count(*) AS run_len
                FROM runs GROUP BY doc_id, run_id),
        agg AS (SELECT doc_id, count(*) AS n_segments,
                       max(run_len) AS max_run
                FROM seg GROUP BY doc_id)
        SELECT v.doc_id, CAST(sum(voiced) AS BIGINT) AS n_voiced,
               coalesce(max(n_segments), 0) AS n_segments,
               coalesce(max(max_run), 0) AS max_run
        FROM v LEFT JOIN agg ON agg.doc_id = v.doc_id
        GROUP BY v.doc_id
        ORDER BY v.doc_id""")),

    // ------------------------------------------------------- ViT patchify
    // Patch-grid extraction, the ViT/CLIP preprocessing shape: the
    // 128-byte payload is read as a 16×8 pixel plane and split into a
    // 4×2 grid of 4×4 patches; per patch the kernel emits mean (exact
    // milli-units: sum·1000 div 16), min and max — the stats a patch
    // embedder would consume. Entirely map-side until the (doc, patch)
    // aggregate; patch rows are 5 small integers, so at 100 TB the
    // shuffle carries patch summaries, never pixels. Swap the byte
    // plane for a real decoded raster to patchify real images.
    "q_mm_patchify" -> GraftQuery(
      run = (s, d) =>
        synth(s, d)
          .select(col("doc_id"), col("blob"),
            explode(expr("sequence(1, 128)")).as("pos"))
          .select(col("doc_id"),
            expr("((pos - 1) div 8) div 4").as("patch_r"),
            expr("((pos - 1) % 8) div 4").as("patch_c"),
            expr(byteAt("blob", "pos")).as("b"))
          .groupBy("doc_id", "patch_r", "patch_c")
          .agg(expr("(sum(b) * 1000) div 16").as("mean_milli"),
            min(col("b")).as("min_b"), max(col("b")).as("max_b"))
          .orderBy("doc_id", "patch_r", "patch_c"),
      oracle = Some(s"""
        WITH $synthCte,
        px AS (SELECT doc_id, p.pos,
                      ((p.pos - 1) // 8) // 4 AS patch_r,
                      ((p.pos - 1) % 8) // 4 AS patch_c,
                      ${byteAtDuck("p.pos")} AS b
               FROM media, (SELECT unnest(generate_series(1, 128)) AS pos)
                             AS p)
        SELECT doc_id, patch_r, patch_c,
               CAST((sum(b) * 1000) // 16 AS BIGINT) AS mean_milli,
               min(b) AS min_b, max(b) AS max_b
        FROM px GROUP BY 1, 2, 3
        ORDER BY doc_id, patch_r, patch_c""")),

    // ------------------------------------------- cross-modal dedup union
    // A multimodal corpus duplicates along EITHER axis: same caption on
    // different videos (text near-dup), same video re-captioned (frame
    // near-dup). Each modality's candidate generator runs its own
    // bounded index (MinHash bands / frame-fingerprint postings — the
    // two packs this composes), and the dispositions union on the pair
    // key, labeling which modality flagged it — the curation decision
    // differs per label (text_only → keep one caption; frames_only →
    // keep one video; both → exact re-upload).
    "q_mm_cross_modal_dedup" -> GraftQuery(
      run = (s, d) => {
        import s.implicits._
        val bands = graft.operators.Dedup.minhashBandRows(
            graft.operators.Dedup.shingleSetsCached(s, d))
          .toDF("doc_id", "band", "key")
        val textPairs = graft.operators.Dedup.bandPairs(bands)
          .withColumn("in_text", lit(1L))
        val frameLeg = framePairs(s, frameSignatures(s, d))
          .filter(col("n_shared") >= 2)
          .select(col("d1"), col("d2"))
          .withColumn("in_frames", lit(1L))
        // coalesce the flags first, then derive the label from the
        // coalesced values — no name shadowing between the two selects
        textPairs.join(frameLeg, Seq("d1", "d2"), "outer")
          .select(col("d1"), col("d2"),
            coalesce(col("in_text"), lit(0L)).as("in_text"),
            coalesce(col("in_frames"), lit(0L)).as("in_frames"))
          .select(col("d1"), col("d2"), col("in_text"), col("in_frames"),
            when(col("in_text") === 1L && col("in_frames") === 1L,
              lit("both"))
              .when(col("in_text") === 1L, lit("text_only"))
              .otherwise(lit("frames_only")).as("modality"))
          .orderBy("d1", "d2")
      },
      oracle = Some(s"""
        WITH ${graft.operators.Dedup.docShinglesCte},
        ${graft.operators.Dedup.minhashBandsCte},
        $vpairsCte,
        tp AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.key = b.key
                    AND a.doc_id < b.doc_id),
        fp AS (SELECT d1, d2 FROM vpairs)
        SELECT coalesce(tp.d1, fp.d1) AS d1, coalesce(tp.d2, fp.d2) AS d2,
               CAST(CASE WHEN tp.d1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
                 AS in_text,
               CAST(CASE WHEN fp.d1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
                 AS in_frames,
               CASE WHEN tp.d1 IS NOT NULL AND fp.d1 IS NOT NULL THEN 'both'
                    WHEN tp.d1 IS NOT NULL THEN 'text_only'
                    ELSE 'frames_only' END AS modality
        FROM tp FULL OUTER JOIN fp ON fp.d1 = tp.d1 AND fp.d2 = tp.d2
        ORDER BY d1, d2""")),

    // -------------------------------- caption↔frame alignment (CLIP prep)
    // Pairing captions to frames is the preprocessing step before
    // contrastive (CLIP-style) training: each caption token is
    // attributed to the frame whose 32-char span contains the token's
    // midpoint, giving per-(doc, frame) token counts and the densest
    // frame per doc — the frame a pair-builder would sample against the
    // caption. Token offsets come from a per-doc prefix sum over the
    // RAW split (empty tokens still occupy a position, so offsets stay
    // char-exact); the window is partitioned by doc_id, so the sort is
    // per-document, never global. Only (doc, frame, count) triples
    // shuffle. Best-frame selection is min over a (−count, frame)
    // struct — one aggregate, no second window pass.
    "q_mm_caption_align" -> GraftQuery(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("doc_id").orderBy("i")
          .rowsBetween(Window.unboundedPreceding, -1)
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            least(floor(col("n_chars") / 32), lit(8)).cast("int")
              .as("n_frames"),
            posexplode(split(col("text"), " ")).as(Seq("i", "w")))
          .withColumn("start",
            lit(1L) + coalesce(sum(length(col("w")) + 1).over(w), lit(0L)))
          .withColumn("mid",
            col("start") + expr("(length(w) - 1) div 2"))
          .withColumn("f", expr("CAST((mid - 1) div 32 AS INT)"))
          .filter(col("w") =!= "" && col("f") < col("n_frames"))
        val perFrame = toks.groupBy("doc_id", "n_frames", "f")
          .agg(count(lit(1)).as("n_tok"))
        perFrame.groupBy("doc_id", "n_frames")
          .agg(sum(col("n_tok")).as("n_aligned"),
            expr("min(struct(-n_tok AS neg, f)).f").as("best_frame"),
            max(col("n_tok")).as("best_count"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH s AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
                   FROM documents),
        tk AS (
          SELECT doc_id, least(n_chars // 32, 8) AS n_frames, t.i,
                 ws[t.i] AS w
          FROM s,
               LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) t),
        off AS (
          SELECT doc_id, n_frames, w,
                 1 + coalesce(sum(length(w) + 1) OVER (
                       PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS start
          FROM tk),
        fr AS (
          SELECT doc_id, n_frames,
                 ((start + (length(w) - 1) // 2) - 1) // 32 AS f
          FROM off WHERE w <> ''),
        pf AS (
          SELECT doc_id, n_frames, f, count(*) AS n_tok
          FROM fr WHERE f < n_frames GROUP BY 1, 2, 3)
        SELECT doc_id, CAST(n_frames AS INT) AS n_frames,
               CAST(sum(n_tok) AS BIGINT) AS n_aligned,
               CAST(min({'neg': -n_tok, 'f': f}).f AS INT) AS best_frame,
               CAST(max(n_tok) AS BIGINT) AS best_count
        FROM pf GROUP BY doc_id, n_frames
        ORDER BY doc_id""")),

    // --------------- interleaved text+frame training-sequence builder
    // The multimodal packing step: each document becomes ONE training
    // sequence interleaving 32-word text chunks with the frame tokens
    // of its (synthetic) video — chunk i at position 2i, frame i at
    // 2i+1 (the vsynth frames cover exactly the 32-char text windows,
    // so chunk i and frame i describe the same span — the
    // caption-next-to-image layout interleaved pretraining wants).
    // Text chunk cost = its word count, frame cost = 4 visual tokens;
    // a 256-token budget truncates each sequence via a per-doc prefix
    // sum. Everything is exact integers; the only window is
    // partitioned BY doc over that doc's own ≤ 24 items. Scale shape:
    // explode + window per doc key — embarrassingly parallel, no
    // corpus-wide exchange at any size.
    "q_mm_interleave" -> GraftQuery(
      run = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val t = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            size(filter(split(col("text"), " "), w => w =!= ""))
              .cast("long").as("n_words"))
          .filter(col("n_words") > 0)
          .withColumn("n_frames", expr("least(n_chars div 32, 8)"))
          .withColumn("nc", expr("(n_words + 31) div 32"))
        val textItems = t
          .select(col("doc_id"), col("n_words"),
            explode(expr("sequence(0, nc - 1)")).as("i"))
          .select(col("doc_id"), (col("i") * 2).as("pos"),
            lit("text").as("kind"), col("i").as("ref"),
            least(lit(32L), col("n_words") - col("i") * 32).as("tok_cost"))
        val frameItems = t.filter(col("n_frames") > 0)
          .select(col("doc_id"),
            explode(expr("sequence(0, n_frames - 1)")).as("i"))
          .select(col("doc_id"), (col("i") * 2 + 1).as("pos"),
            lit("frame").as("kind"), col("i").as("ref"),
            lit(4L).as("tok_cost"))
        val w = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        textItems.unionByName(frameItems)
          .withColumn("cum_cost", sum(col("tok_cost")).over(w))
          .filter(col("cum_cost") <= 256)
          .orderBy("doc_id", "pos")
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, n_chars,
                 CAST(len(list_filter(string_split(text, ' '),
                                      w -> w <> '')) AS BIGINT) AS n_words
          FROM documents),
        dims AS (
          SELECT doc_id, n_words,
                 least(n_chars // 32, 8) AS n_frames,
                 (n_words + 31) // 32 AS nc
          FROM t WHERE n_words > 0),
        ti AS (
          SELECT doc_id, i * 2 AS pos, 'text' AS kind, i AS ref,
                 least(32, n_words - i * 32) AS tok_cost
          FROM (SELECT doc_id, n_words,
                       unnest(generate_series(0, nc - 1)) AS i
                FROM dims)),
        fi AS (
          SELECT doc_id, i * 2 + 1 AS pos, 'frame' AS kind, i AS ref,
                 CAST(4 AS BIGINT) AS tok_cost
          FROM (SELECT doc_id,
                       unnest(generate_series(0, n_frames - 1)) AS i
                FROM dims WHERE n_frames > 0)),
        seq AS (
          SELECT *, CAST(sum(tok_cost) OVER (
                      PARTITION BY doc_id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cost
          FROM (SELECT * FROM ti UNION ALL SELECT * FROM fi))
        SELECT doc_id, pos, kind, ref, tok_cost, cum_cost
        FROM seq WHERE cum_cost <= 256
        ORDER BY doc_id, pos"""))
  )
}

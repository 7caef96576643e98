package graft.streaming

import graft.{GraftQuery, QueryPack}
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming corpus operators over the `documents` table — the online
  * forms of the [[graft.operators.Dedup]] batch pack.
  *
  * Streaming near-dup dedup is the shape a continuously-ingesting
  * training-data pipeline needs: each arriving document is admitted or
  * flagged against everything seen SO FAR, without re-scanning the
  * corpus. MinHash band keys make that a pure key-value state problem:
  * a doc is a near-dup candidate iff some band key was already claimed
  * by an earlier doc, so the state per band key is just the canonical
  * (minimum) doc_id — O(1) state per key in the state store, the same
  * scale shape as streaming exact dedup.
  *
  * Replayed over the static parquet with `Trigger.AvailableNow` (one
  * micro-batch), "earliest doc wins" is "minimum doc_id wins", which is
  * exactly SQL over the band table — hence a full DuckDB oracle. Pointed
  * at a live landing directory, the same query gives first-ARRIVAL-wins
  * semantics with state carried across micro-batches — the production
  * behavior (`MultiBatchStateSpec`-style carry is proven for the events
  * sessionizer; the band-key state here is strictly simpler).
  */
object DocStreams extends QueryPack {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** (doc_id, partner) stream: every document that shares a MinHash band
    * key with an already-seen document, paired with that key's canonical
    * (first-seen) doc. First-ARRIVAL-wins: the state per band key is the
    * first doc to claim it; within one micro-batch "first" is
    * canonicalized to the minimum doc_id (task order is not
    * deterministic, the minimum is). Exposed for the multi-batch spec;
    * the registry query replays the static table in one batch, where
    * first-seen ≡ minimum doc_id — the SQL oracle. */
  private[streaming] def minhashPartnerStream(
      s: SparkSession, dir: String, glob: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import s.implicits._
    val reader = s.readStream.schema(docSchema)
      .option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    Dedup.minhashBandRows(
        Dedup.shingleSets(reader.parquet(dir)).as[(Long, Seq[String])])
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, String), it: Iterator[(Long, Int, String)],
         state: GroupState[Long]) => {
          val ids = it.map(_._1).toArray
          java.util.Arrays.sort(ids)
          if (state.exists) {
            // the key is claimed: every arriving doc is a near-dup of
            // the standing canonical (skip a replayed canonical itself)
            val m = state.get
            ids.iterator.filter(_ != m).map(id => (id, m))
          } else {
            val m = ids(0)
            state.update(m)
            ids.iterator.drop(1).map(id => (id, m))
          }
        })
      .toDF("doc_id", "partner")
  }

  val queries: Map[String, GraftQuery] = Map(

    // ----------------------------------- streaming MinHash near-dup dedup
    // Map-side signature kernel (shared with the batch LSH query, so the
    // two paths cannot drift) → flatMapGroupsWithState keyed by
    // (band, key): state = the first doc to claim the key; every later
    // doc on the key emits (doc, canonical). A final aggregate takes the
    // minimum canonical over a doc's 4 bands. Only band keys shuffle —
    // 4 small rows per doc, never text.
    "q_stream_minhash_dedup" -> GraftQuery(
      run = (s, d) => {
        val partners = minhashPartnerStream(s, d, "documents.parquet")
        EventStreams.runToMemory(s,
            partners.groupBy("doc_id")
              .agg(min(col("partner")).as("dup_of")),
            "graft_stream_mhdedup", OutputMode.Update())
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH ${Dedup.docShinglesCte},
        ${Dedup.minhashBandsCte},
        gm AS (SELECT band, key, min(doc_id) AS m FROM bands
               GROUP BY 1, 2)
        SELECT b.doc_id AS doc_id, min(g.m) AS dup_of
        FROM bands b JOIN gm g ON g.band = b.band AND g.key = b.key
        WHERE b.doc_id > g.m
        GROUP BY 1 ORDER BY doc_id"""))
  )
}

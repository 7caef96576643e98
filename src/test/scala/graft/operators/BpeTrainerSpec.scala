package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** Golden check: the distributed BPE trainer must learn the same merge
  * table as an independent sequential implementation of the Sennrich
  * algorithm (count pairs over the word-frequency vocabulary, take the
  * (count desc, left, right) argmax, merge, repeat). */
class BpeTrainerSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("bpe-spec")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Sequential reference: deliberately written in the most direct way
    * possible (nested maps, full recount each rank). */
  private def referenceMerges(
      corpus: Seq[String], k: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = corpus
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.size.toLong
      }
    (1 to k).flatMap { rank =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (sym, c) =>
        sym.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      if (counts.isEmpty) None
      else {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        vocab = vocab.groupBy { case (sym, _) =>
          BpeTrainer.mergeSeq(sym.toArray, l, r).toVector
        }.map { case (sym, entries) => sym -> entries.values.sum }
        Some((rank, l, r, cnt))
      }
    }
  }

  test("distributed trainer matches the sequential reference") {
    import spark.implicits._
    // the classic BPE example corpus (word frequencies 5/2/6/3) plus
    // tie-bait: "ab" and "ba" both twice → tie broken lexicographically
    val corpus = Seq(
      "low low low low low lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest ab ab ba ba")
    val docs = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = BpeTrainer.train(spark, docs, 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    got shouldBe referenceMerges(corpus, 6)
  }

  test("merge application is left-to-right non-overlapping") {
    BpeTrainer.mergeSeq(Array("a", "a", "a"), "a", "a").toSeq shouldBe
      Seq("aa", "a")
    BpeTrainer.mergeSeq(Array("a", "b", "a", "b"), "a", "b").toSeq shouldBe
      Seq("ab", "ab")
  }

  test("encode reports the compression the learned merges buy") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa aaaa"), (2L, "xy"))
      .toDF("doc_id", "text")
    // merges: (a,a) -> aa, (aa,aa) -> aaaa: "aaaa" = 4 chars -> 1 token
    val out = BpeTrainer
      .encode(spark, docs, Seq(("a", "a"), ("aa", "aa")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    out(0) shouldBe ((1L, 8L, 2L, 0.25))
    out(1) shouldBe ((2L, 2L, 2L, 1.0))
  }
}

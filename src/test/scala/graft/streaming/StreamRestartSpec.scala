package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** Checkpoint restart semantics: a streaming pipeline that stops and
  * restarts against the same checkpoint must process each input file
  * exactly once — no reprocessing of already-committed batches, no
  * loss of newly-arrived ones. This is the property that makes the
  * landing-directory ingestion pattern (q_ms streaming, event streams)
  * safe to operate: crashes and redeploys are the NORMAL case at
  * 100 TB/day. */
class StreamRestartSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("stream-restart")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("restart from checkpoint processes new files exactly once") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-restart").toString
    val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
    def writeBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("id LONG, v STRING").parquet(in)
        .withColumn("flag", col("id") % 2)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeBatch(0 until 100)
    writeBatch(100 until 200)
    runOnce() // first deployment: two input files committed
    writeBatch(200 until 300)
    runOnce() // "redeploy": only the new file may be processed
    val got = spark.read.parquet(out)
    got.count() shouldBe 300L
    // exactly once: every id present, none duplicated
    got.groupBy("id").count().filter(col("count") =!= 1).count() shouldBe 0L
    got.agg(sum(col("id"))).head().getLong(0) shouldBe (0L until 300L).sum
  }
}

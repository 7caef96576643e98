package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** The registry queries exercise the single-batch path; this spec drives
  * the sessionizer across MULTIPLE micro-batches (maxFilesPerTrigger=1)
  * to prove the GroupState carry: an open session must continue across a
  * batch boundary, a >30-min gap must still split. */
class EventStreamsSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("stream-spec")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val minNs = 60L * 1000000000L

  test("session state carries across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream").toString
    // batch 1: user 1 events at t=0,5min (one open session)
    Seq((1L, 0L * minNs, 1L, "click", 1.0, "{}"),
      (2L, 5L * minNs, 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode(SaveMode.Append).parquet(dir)
    // batch 2 (separate file): continuation at 10min (same session),
    // then a 90-min gap → second session
    Seq((3L, 10L * minNs, 1L, "click", 1.0, "{}"),
      (4L, 100L * minNs, 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode(SaveMode.Append).parquet(dir)

    val q = EventStreams
      .sessionizeStream(spark, dir, maxFilesPerTrigger = Some(1))
      .writeStream.queryName("graft_stream_spec").format("memory")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // memory sink in update mode appends one row per key per batch;
    // the LAST row for user 1 is the final state
    val rows = spark.table("graft_stream_spec").collect()
    rows.length should be >= 1
    val last = rows.last
    last.getAs[Long]("user_id") shouldBe 1L
    last.getAs[Int]("n_sessions") shouldBe 2
    last.getAs[Int]("n_events") shouldBe 4
    last.getAs[Int]("longest_session") shouldBe 3
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("transformWithState carries ValueState across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-tws").toString
    Seq((1L, 0L * minNs, 1L, "click", 1.0, "{}"),
      (2L, 5L * minNs, 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode(SaveMode.Append).parquet(dir)
    Seq((3L, 10L * minNs, 1L, "click", 1.0, "{}"),
      (4L, 100L * minNs, 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode(SaveMode.Append).parquet(dir)

    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = EventStreams
        .twsSessionStream(spark, dir, maxFilesPerTrigger = Some(1))
        .writeStream.queryName("graft_stream_tws_spec").format("memory")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val rows = spark.table("graft_stream_tws_spec").collect()
      rows.length should be >= 1
      val last = rows.last
      last.getAs[Long]("user_id") shouldBe 1L
      last.getAs[Int]("n_sessions") shouldBe 2
      last.getAs[Int]("n_events") shouldBe 4
      last.getAs[Int]("longest_session") shouldBe 3
    } finally spark.conf.unset(key)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}

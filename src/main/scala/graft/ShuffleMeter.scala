package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measures the shuffle volume a block of Spark actions produces —
  * the number that decides whether an operator survives 100 TB.
  * `COVERAGE.md`'s "shuffles carry keys, not bodies" claims are
  * CI-checked with this (see `ShuffleVolumeSpec`): e.g. exact dedup
  * must shuffle digests, not document text, and the claim is asserted
  * in bytes, not prose.
  *
  * Uses a stage-completion listener; listener delivery is async, so
  * after the body finishes we poll until the counters are quiescent.
  */
object ShuffleMeter {

  final case class Volumes(shuffleWrite: Long, shuffleRead: Long)

  def measure(s: SparkSession)(body: => Unit): Volumes = {
    val write = new AtomicLong
    val read = new AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) {
          write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    }
    s.sparkContext.addSparkListener(listener)
    try {
      body
      // listener bus is async: wait until the counters stop moving
      var prev = -1L
      var cur = write.get + read.get
      var spins = 0
      while (prev != cur && spins < 50) {
        Thread.sleep(100)
        prev = cur; cur = write.get + read.get; spins += 1
      }
      Volumes(write.get, read.get)
    } finally s.sparkContext.removeSparkListener(listener)
  }
}

package graft.sparkutil

/** Scratch directories for session-scoped durable stores (band index,
  * IVF assignments, streaming upsert targets): created under the system
  * temp dir and deleted recursively when the JVM exits, so repeated
  * sessions on a shared box don't accumulate orphaned store
  * directories. Deletion is best-effort — a killed JVM leaves the dir
  * to the OS tmp reaper, which is the correct failure mode for scratch
  * space. */
object TempStores {

  private val created =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { p =>
      try {
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { java.nio.file.Files.deleteIfExists(f): Unit })
      } catch { case _: Throwable => () }
    }
  }))

  /** A fresh scratch directory; returns its absolute path. */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}

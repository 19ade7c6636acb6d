package graft.tools

import java.nio.file.{Files, Path}

/** Scratch directories for queries that exercise a persisted-store
  * lifecycle (q117 band index, q122 IVF index, q112 format parity) —
  * each invocation gets a fresh temp dir, and ALL of them are removed
  * at JVM exit by one shutdown hook, so repeated gate/bench runs stop
  * leaking disk (round-10 ADVICE). A hook (not inline deletion)
  * because the returned DataFrames read the directory lazily — the
  * store must outlive the query's consumption by the driver. */
object Scratch {
  private val created =
    java.util.Collections.synchronizedList(new java.util.ArrayList[Path]())

  @volatile private var hooked = false

  private def ensureHook(): Unit = synchronized {
    if (!hooked) {
      hooked = true
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        created.forEach { p =>
          try org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
          catch { case _: Throwable => () }
        }))
    }
  }

  /** A temp directory deleted at JVM exit. */
  def dir(prefix: String): String = {
    ensureHook()
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}

package graft.core

import java.util.concurrent.ConcurrentHashMap

/** Per-query scratch-directory registry (generalizes q111's sweep).
  *
  * Round-trip and streaming gates materialize intermediate files
  * (ORC/CSV/Avro/XML snapshots, checkpoints, versioned tables) under
  * java.io.tmpdir. The returned DataFrames are LAZY plans over those
  * files, so a query function cannot delete its own directory before
  * the caller materializes — but unbounded accumulation across a
  * min-of-3 bench x 196 queries x rounds is real disk pressure.
  *
  * Policy: one live directory per prefix. `scoped(prefix)` creates a
  * fresh dir and deletes the PREVIOUS dir registered under the same
  * prefix (safe in Bench/Verify, which fully materialize each run
  * before the next invocation), and a JVM shutdown hook deletes
  * everything still registered — so no `graft_q*` trees outlive the
  * process.
  */
object TempDirs {
  private val live = new ConcurrentHashMap[String, String]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      live.values().forEach(d => deleteRecursively(d))
    }))

  /** Fresh temp dir under `prefix`; sweeps the previous dir registered
    * under the same (prefix, thread). Returns the absolute path.
    *
    * Keyed by calling thread, not prefix alone: if the same query runs
    * concurrently in one JVM (parallel ScalaTest suites both touching
    * a SourceQueries/StreamingQueries entry), a prefix-only registry
    * would let the second call delete files a still-lazy plan from the
    * first call reads. Per-thread keys mean a call can only ever sweep
    * its own thread's previous generation; cross-thread dirs survive
    * until the shutdown hook.
    */
  def scoped(prefix: String): String = {
    hookInstalled
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    val key = s"$prefix@${Thread.currentThread().getId}"
    Option(live.put(key, dir)).foreach(deleteRecursively)
    dir
  }

  def deleteRecursively(path: String): Unit = {
    val root = new java.io.File(path)
    def loop(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(loop))
      f.delete(); ()
    }
    if (root.exists()) loop(root)
  }
}

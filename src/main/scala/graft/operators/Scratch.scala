package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Deterministic per-tag scratch directories for queries whose gated path
  * materializes a table or index on disk (a22 compaction, a23 partitioned
  * totals, b50 bucketed tables, d15/g10 disk indexes, g13 streaming
  * replay).
  *
  * One FIXED path per tag under the JVM temp dir, wiped on every
  * acquisition: Bench and Verify invoke each query several times (warm +
  * timed runs), and a `Files.createTempDirectory` per invocation leaked a
  * full table copy per run — unbounded /tmp growth over a session (r9
  * ADVICE). A deterministic overwrite-in-place path keeps disk usage at
  * exactly one copy per tag, and the per-call wipe keeps invocations
  * independent (no stale files from a previous run's layout).
  */
object Scratch {

  /** Acquire (create-or-wipe) the scratch directory for `tag`. */
  def dir(tag: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_scratch", tag)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally walk.close()
    }
    Files.createDirectories(p)
    p.toString
  }
}

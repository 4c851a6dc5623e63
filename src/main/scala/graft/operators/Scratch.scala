package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.PosixFilePermissions
import java.util.Comparator

/** Deterministic per-tag scratch directories for queries whose gated path
  * materializes a table or index on disk (a22 compaction, a23 partitioned
  * totals, b50 bucketed tables, d15/g10 disk indexes, g13 streaming
  * replay).
  *
  * The root is unique to this (user, process) pair —
  * `<tmp>/graft_scratch_<user>_<pid>`, created with owner-only
  * permissions — so two concurrent harness processes (e.g. a driver
  * running Verify at two SFs at once) can NEVER alias each other's
  * tables: the r10 a23 driver-red was exactly a fixed shared
  * `/tmp/graft_scratch/<tag>` being wiped-and-rewritten by one process
  * while another re-read it between two Spark actions. Per-user scoping
  * plus `rwx------` also closes the multi-user fixed-path collision /
  * symlink exposure on a shared host.
  *
  * WITHIN a process the per-tag path stays fixed and is wiped on every
  * acquisition: Bench and Verify invoke each query several times (warm +
  * timed runs), and a `Files.createTempDirectory` per invocation leaked a
  * full table copy per run — unbounded /tmp growth over a session (r9
  * ADVICE). Overwrite-in-place keeps disk usage at exactly one copy per
  * tag, the per-call wipe keeps invocations independent, and a JVM
  * shutdown hook removes the whole root on normal exit so sequential
  * sessions don't accumulate roots.
  */
object Scratch {

  private lazy val root: Path = {
    val user = sys.props.getOrElse("user.name", "u").replaceAll("[^A-Za-z0-9._-]", "_")
    val pid  = ProcessHandle.current().pid()
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft_scratch_${user}_$pid")
    try Files.createDirectories(p,
      PosixFilePermissions.asFileAttribute(PosixFilePermissions.fromString("rwx------")))
    catch { case _: UnsupportedOperationException => Files.createDirectories(p) }
    Runtime.getRuntime.addShutdownHook(new Thread(() => wipe(p)))
    p
  }

  private def wipe(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally walk.close()
    }

  /** Acquire (create-or-wipe) this process's scratch directory for `tag`. */
  def dir(tag: String): String = {
    val p = root.resolve(tag)
    wipe(p)
    Files.createDirectories(p)
    p.toString
  }
}

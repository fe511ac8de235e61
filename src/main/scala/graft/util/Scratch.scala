package graft.util

import java.io.File
import java.nio.file.{Files, Path}

/** Per-JVM scratch space for the queries that need a throwaway
  * warehouse / stream source / checkpoint dir (the Engine lifecycle
  * family, the file-fed streaming queries). All dirs live under ONE
  * per-JVM root that a shutdown hook deletes recursively, so repeated
  * invocations (Bench's min-of-2, a long test run) can create fresh
  * dirs — required, because the Engine queries MUTATE their warehouse
  * and must start from empty — without leaking them past the process.
  */
object Scratch {

  private lazy val root: Path = {
    val p = Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(p.toFile)))
    p
  }

  /** A fresh empty directory under the auto-cleaned root. */
  def dir(prefix: String): Path = Files.createTempDirectory(root, prefix)

  private def deleteRec(f: File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete(): Unit
  }
}

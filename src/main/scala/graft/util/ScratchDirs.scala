package graft.util

import java.io.File

/** Bounded scratch-directory lifecycle for the write-path operators
  * (`compact_files`, `ppdb_convert_release`, `sink_partitioned`): each
  * invocation writes a fresh per-invocation dir (uniqueness is what kills
  * construction races — round 12), and THIS registry bounds the
  * accumulation a REPS=N bench or long-lived session would otherwise pile
  * into the JVM temp root (ADVICE r12): registering generation N deletes
  * generations ≤ N−keep of the same key.
  *
  * keep = 2, not 1: the operators return LAZY frames that re-read their
  * scratch on evaluation, so the previous invocation's dir may still be
  * live when the next one is constructed (construct → construct → evaluate
  * is legal); two generations back is dead in every construct/evaluate
  * interleaving the harness runs. A JVM shutdown hook additionally removes
  * each whole scratch root, so nothing survives the process.
  */
object ScratchDirs {

  private val generations =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.ArrayDeque[String]]()

  /** Register `dir` as key's newest generation; prune older ones. */
  def register(key: String, dir: String, keep: Int = 2): Unit = {
    val q = generations.computeIfAbsent(key, _ => new java.util.ArrayDeque[String]())
    val stale = q.synchronized {
      q.addLast(dir)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (q.size > keep) out += q.removeFirst()
      out.toSeq
    }
    stale.foreach(d => deleteRecursively(new File(d)))
  }

  def deleteRecursively(f: File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Best-effort whole-root cleanup at JVM exit. */
  def deleteRootOnExit(root: String): Unit =
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteRecursively(new File(root))))
}

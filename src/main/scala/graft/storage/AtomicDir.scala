package graft.storage

/** Publish-once protocol for fingerprint-keyed derived layouts shared
  * across JVMs (vector indexes, bucketed fact files, rendered source
  * fixtures).
  *
  * The old pattern — every JVM writes `mode("overwrite")` straight into
  * the shared fingerprint-keyed directory — let a second concurrent JVM
  * rebuild the layout while the first was mid-scan: readers could observe
  * deleted files or a mix of generations. Here the target directory only
  * ever APPEARS via an atomic rename (`rename(2)` on one filesystem), so
  * its existence implies a complete build:
  *
  *   - target exists → published and immutable; reuse without building.
  *   - else build into a unique sibling temp dir, then rename into place.
  *   - a concurrent builder (same JVM — `TrieMap.getOrElseUpdate` can run
  *     a thunk twice — or another JVM) that loses the rename deletes its
  *     temp build and reads the winner's.
  *
  * Same commit discipline as [[LogTableWriter]]'s atomic-rename store.
  */
object AtomicDir {

  def publishOnce(target: String)(build: String => Unit): String = {
    val t = java.nio.file.Paths.get(target)
    if (java.nio.file.Files.isDirectory(t)) return target
    val tmp = target + ".tmp-" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    build(tmp)
    try
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp), t,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileSystemException =>
        // another builder won the rename; its published dir is complete
        deleteRecursively(new java.io.File(tmp))
    }
    target
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteRecursively)
    f.delete()
  }
}

package graft

/** The engine's one recursive delete, shared by every store/layout
  * teardown path (vacuum, generation prunes, temp dedup stores, test
  * fixtures). These sites used to carry identical inline copies; a
  * future behavioral fix (symlink traversal, retry on ENOTEMPTY) must
  * land once, here.
  */
object FsUtil {
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val c = java.nio.file.Files.list(p)
      try c.forEach(deleteRecursively(_)) finally c.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }
}

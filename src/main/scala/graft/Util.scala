package graft

/** Small shared utilities (one definition — several callers). */
object Util {

  /** Recursive directory delete, safe on missing paths and races. */
  def deleteRecursively(f: java.io.File): Unit = if (f.exists()) {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete()
  }
}

package graft.core

/** Tiny filesystem helpers shared by the sink/bucketed paths. */
object Fs {
  /** Recursive delete; no-op when the path does not exist. */
  def rmTree(f: java.io.File): Unit = if (f.exists()) {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(f.toPath).sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }
  def rmTree(path: String): Unit = rmTree(new java.io.File(path))
}

package graft.core

import org.apache.spark.sql.SparkSession

/** Scoped mutation of session-global SQL confs. Spark offers no
  * per-query conf, so save/set/run/restore is the only lever — and two
  * concurrent scopes on the same session would race their restores
  * (A saves 200→sets 8; B saves 8; A restores 200; B restores 8 —
  * leaving the session at 8 forever). Every graft code path that scopes
  * a conf goes through this JVM-wide lock, so a late restore can never
  * clobber another scope's save. Unrelated queries running concurrently
  * still observe the scoped value for the duration — inherent to
  * session-global conf; the lock protects the restore, and the scoped
  * sections here are short-lived.
  */
object SessionConf {
  def scoped[T](s: SparkSession, kvs: (String, String)*)(body: => T): T =
    synchronized {
      val prev = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
      kvs.foreach { case (k, v) => s.conf.set(k, v) }
      try body
      finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None)    => s.conf.unset(k)
      }
    }
}

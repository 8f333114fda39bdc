package graft.zonal

/** Signature-check memo for streaming landing directories (r20 —
  * ADVICE r19: `members()` opened and read the magic bytes of EVERY
  * file on EVERY micro-batch tick — latestOffset, reportLatestOffset
  * and planInputPartitions each call it, so a long-lived stream over a
  * large landing directory degraded quadratically in file opens).
  *
  * Landing members are append-only and immutable once complete (the
  * committed-member contract every streaming face states), so a
  * file's verdict is cached per (path, length): a partially-landed
  * file that later grows re-probes at its new length; a finished
  * member is probed exactly once per JVM. Zarr member DIRECTORIES
  * have no stable length — there only the POSITIVE verdict memoizes
  * (once a store carries an array document it stays a member), and a
  * not-yet-complete store re-probes every tick.
  */
private[zonal] object MemberSig {
  private val byLen =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Boolean]()
  private val positive = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Memoized probe for an immutable-at-length FILE member. A probe
    * that THROWS is not cached (r20 code review: a transient IO error
    * must not permanently exclude a valid member — computeIfAbsent
    * propagates the exception without recording a verdict; the caller
    * treats it as "not a member THIS tick" and re-probes next tick).
    * The memo is crudely bounded: a pathological churn of
    * (path, length) pairs clears it rather than growing without end.
    */
  def check(key: String, len: Long)(probe: => Boolean): Boolean = {
    if (byLen.size() > 4_000_000) byLen.clear()
    byLen.computeIfAbsent((key, len), _ => probe)
  }

  /** Positive-only memoized probe for a DIRECTORY member. */
  def checkPositive(key: String)(probe: => Boolean): Boolean =
    positive.contains(key) || { val v = probe; if (v) positive.add(key); v }
}

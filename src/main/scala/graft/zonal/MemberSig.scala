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

  private val Cap = 4_000_000

  /** Evict roughly a quarter of `m`'s entries instead of clearing it
    * (r20 advice: clear() dropped every hot verdict at once — the next
    * tick paid a full re-probe latency spike over the whole directory).
    * Selection is by iteration order (effectively arbitrary for a
    * ConcurrentHashMap) — crude but O(evicted), keeps 3/4 of the hot
    * set, and bounds the map the same as before.
    */
  private def evictQuarter(m: java.util.concurrent.ConcurrentHashMap[_, _]): Unit = {
    val drop = m.size() / 4
    val it = m.keySet().iterator()
    var i = 0
    while (i < drop && it.hasNext) { it.next(); it.remove(); i += 1 }
  }

  /** Memoized probe for an immutable-at-length FILE member. A probe
    * that THROWS is not cached (r20 code review: a transient IO error
    * must not permanently exclude a valid member — computeIfAbsent
    * propagates the exception without recording a verdict; the caller
    * treats it as "not a member THIS tick" and re-probes next tick).
    * The memo is crudely bounded: past the cap a quarter of the
    * entries are evicted (r20 advice: never the whole map at once).
    */
  def check(key: String, len: Long)(probe: => Boolean): Boolean = {
    if (byLen.size() > Cap) evictQuarter(byLen)
    byLen.computeIfAbsent((key, len), _ => probe)
  }

  /** Positive-only memoized probe for a DIRECTORY member. The positive
    * set gets the same crude bound as the byLen memo (r20 advice: it
    * was unbounded) — an evicted member just re-probes positive on its
    * next tick.
    */
  def checkPositive(key: String)(probe: => Boolean): Boolean =
    positive.contains(key) || {
      val v = probe
      if (v) {
        if (positive.size() > Cap) {
          val it = positive.iterator()
          var i = 0
          val drop = positive.size() / 4
          while (i < drop && it.hasNext) { it.next(); it.remove(); i += 1 }
        }
        positive.add(key)
      }
      v
    }
}

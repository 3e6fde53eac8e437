package graft.util

/** Bounded access-ordered LRU memo — the per-JVM cache discipline for
  * long-lived service processes (a JVM that churns through many tables
  * or index paths must not grow a map entry per object it EVER
  * touched; the WordMemo idle-eviction in [[graft.ext.Bpe]] is the
  * same class of fix for heavier values). Past `maxEntries` the least
  * recently USED entry is dropped; a dropped entry just re-resolves
  * cold on its next use — every cache this wraps is a pure memo over
  * durable state, never the source of truth.
  *
  * All operations synchronize on the map: the call sites are metadata
  * paths (manifest resolution, index-build lock lookup) measured in
  * dozens of calls per batch, never per-row work.
  */
final class LruCache[K, V](maxEntries: Int) {
  require(maxEntries > 0, s"maxEntries must be positive, got $maxEntries")

  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > maxEntries
  }

  def get(k: K): Option[V] = m.synchronized(Option(m.get(k)))
  def put(k: K, v: V): Unit = m.synchronized { m.put(k, v); () }
  def remove(k: K): Unit = m.synchronized { m.remove(k); () }
  def clear(): Unit = m.synchronized(m.clear())
  def size: Int = m.synchronized(m.size())

  /** Atomic get-or-create. `mk` runs under the map lock — keep it
    * allocation-only (the lock-object use case), never I/O.
    */
  def getOrElseUpdate(k: K)(mk: => V): V = m.synchronized {
    val cur = m.get(k)
    if (cur != null) cur
    else { val v = mk; m.put(k, v); v }
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Shared registry for memoized persisted DataFrames (the daily-series,
  * severity-chain, shingle and simhash tables). Replaces the per-object
  * TrieMaps, fixing two lifecycle bugs:
  *
  *  - key collisions: the old key `semanticHash().toLong << 32 |
  *    identityHashCode(session)` OR'd a sign-extended Int, so a negative
  *    identity hash erased the semanticHash word and two corpora could
  *    silently share one persisted table. Keys here are (session, key)
  *    tuples compared structurally — no bit packing.
  *  - unbounded growth: entries (and their MEMORY_AND_DISK blocks) lived
  *    for the JVM lifetime, across stopped sessions. The registry is
  *    LRU-bounded and [[clear]] unpersists everything a session pinned;
  *    entries of stopped sessions are dropped eagerly.
  */
object Caches {

  private final case class Entry(session: SparkSession, df: DataFrame)

  private val maxEntries = 64
  private val entries =
    scala.collection.mutable.LinkedHashMap.empty[(SparkSession, Any), Entry]

  /** Memoize `build` (which should return an already-persisted frame)
    * under (session, key). LRU: re-access moves the entry to the back;
    * past [[maxEntries]] the oldest entry is unpersisted and dropped. */
  def getOrUpdate(s: SparkSession, key: Any)(build: => DataFrame): DataFrame =
    synchronized {
      entries.filterInPlace { case (_, e) =>
        val dead = e.session.sparkContext.isStopped
        if (dead) safeUnpersist(e.df)
        !dead
      }
      val k = (s, key)
      entries.remove(k) match {
        case Some(e) =>
          entries.put(k, e) // refresh LRU position
          e.df
        case None =>
          val df = build
          entries.put(k, Entry(s, df))
          while (entries.size > maxEntries) {
            val (ok, oe) = entries.head
            entries.remove(ok)
            safeUnpersist(oe.df)
          }
          df
      }
    }

  /** Convenience: memoize + persist MEMORY_AND_DISK in one call. */
  def persisted(s: SparkSession, key: Any)(build: => DataFrame): DataFrame =
    getOrUpdate(s, key)(build.persist(StorageLevel.MEMORY_AND_DISK))

  /** Unpersist and drop every entry owned by `s` (long-lived drivers call
    * this between corpora; Verify/Bench call it before stop). */
  def clear(s: SparkSession): Unit = synchronized {
    entries.filterInPlace { case ((owner, _), e) =>
      val mine = owner eq s
      if (mine) safeUnpersist(e.df)
      !mine
    }
  }

  private def safeUnpersist(df: DataFrame): Unit =
    try if (!df.sparkSession.sparkContext.isStopped) df.unpersist(false)
    catch { case _: Throwable => () }
}

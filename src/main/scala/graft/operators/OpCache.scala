package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bounded registry for operator-scoped `persist()`s (the
  * self-join inputs of Dedup/Similarity: shingle sets, signatures,
  * quantized embeddings).
  *
  * Why not bare `.persist()`: every call pinned a fresh cache entry
  * for the session lifetime, so a long-lived job server serving many
  * corpora grew block-manager storage without bound (Bench/Verify
  * hid it behind `clearCache()`). Why not unpersist-before-return:
  * operators return LAZY frames, so an in-operator release would
  * drop the cache before the caller's action ever used it — and
  * cross-call reuse (the warm-pass speed the bench measures) would
  * be lost.
  *
  * This registry keeps both properties with bounded storage, the
  * same shape as [[MaillogOps]]'s parsedCache:
  *  - keyed by (session, canonicalized plan): a repeat call with the
  *    same inputs returns the SAME DataFrame — cache reuse by
  *    reference, not by the cache manager's plan matching;
  *  - a hit re-arms `persist()` (no-op when still cached), so an
  *    external `clearCache()` degrades to recompute, never to a
  *    wrong result;
  *  - at most [[MaxEntries]] live entries; the least-recently-used
  *    beyond the cap are unpersisted (recompute-correct for any
  *    reader mid-query);
  *  - entries owned by a stopped SparkContext are swept on miss;
  *  - [[release]] drops a session's entries eagerly (job-server
  *    hygiene; the spec asserts storage returns to baseline).
  *
  * put+trim runs under a lock (misses are rare): concurrent misses
  * must not transiently exceed the cap or double-persist.
  */
private[graft] object OpCache {

  private val entries = scala.collection.mutable.LinkedHashMap
    .empty[(SparkSession, LogicalPlan), (DataFrame, Long)]
  private val tick = new java.util.concurrent.atomic.AtomicLong()
  private[graft] val MaxEntries = 48

  private def unpersistQuietly(df: DataFrame): Unit =
    try df.unpersist(blocking = false) catch { case _: Throwable => () }

  /** Persist-or-reuse `df`. Returns the registered (persisted)
    * frame — possibly an earlier call's identical-plan DataFrame. */
  def cached(df: DataFrame): DataFrame = synchronized {
    val key = (df.sparkSession, df.queryExecution.logical.canonicalized)
    entries.get(key) match {
      case Some((prev, _)) =>
        entries.update(key, (prev, tick.incrementAndGet()))
        prev.persist() // re-arm after an external clearCache (no-op otherwise)
        prev
      case None =>
        // sweep entries whose owning context has stopped
        entries.filterInPlace { case ((owner, _), (old, _)) =>
          val dead = try owner.sparkContext.isStopped catch { case _: Throwable => true }
          if (dead) unpersistQuietly(old)
          !dead
        }
        df.persist()
        entries.update(key, (df, tick.incrementAndGet()))
        if (entries.size > MaxEntries) {
          val evict = entries.toSeq.sortBy(_._2._2)
            .dropRight(MaxEntries)
          evict.foreach { case (k, (old, _)) =>
            entries.remove(k)
            unpersistQuietly(old)
          }
        }
        df
    }
  }

  /** Collect-once SCALAR control state (round 19, VERDICT r18 #6 —
    * the s13 ladder's stride aggregates): the single row of a bounded
    * 1-row aggregate, memoized per (session, canonical plan) exactly
    * like [[cached]] frames and swept by the same [[release]]. The
    * p25 precedent: a ≤1-row collect is bounded control state, legal
    * to feed back into plan construction as a LITERAL — which is what
    * erases the broadcast-subtree job ladders a per-consumer scalar
    * subquery costs. Same cap/LRU discipline as the frame registry;
    * entries are one Row each, so eviction is bookkeeping only. */
  def scalarRow(df: DataFrame): org.apache.spark.sql.Row = {
    val key = (df.sparkSession, df.queryExecution.logical.canonicalized)
    val hit = synchronized {
      scalars.get(key).map { case (r, _) =>
        scalars.update(key, (r, tick.incrementAndGet())); r
      }
    }
    hit.getOrElse {
      // collect OUTSIDE the lock (a miss runs a Spark job; holding the
      // registry lock across it would serialize unrelated operators)
      val row = df.head()
      synchronized {
        scalars.get(key) match {
          case Some((prev, _)) => prev
          case None =>
            scalars.update(key, (row, tick.incrementAndGet()))
            if (scalars.size > MaxEntries)
              scalars.toSeq.sortBy(_._2._2).dropRight(MaxEntries)
                .foreach { case (k, _) => scalars.remove(k) }
            row
        }
      }
    }
  }

  private val scalars = scala.collection.mutable.LinkedHashMap
    .empty[(SparkSession, LogicalPlan), (org.apache.spark.sql.Row, Long)]

  /** Unpersist and forget every entry owned by `spark`. */
  def release(spark: SparkSession): Unit = synchronized {
    entries.filterInPlace { case ((owner, _), (old, _)) =>
      val mine = owner eq spark
      if (mine) unpersistQuietly(old)
      !mine
    }
    scalars.filterInPlace { case ((owner, _), _) => !(owner eq spark) }
  }

  /** Live entry count for `spark` (spec hook). */
  private[graft] def liveEntries(spark: SparkSession): Int = synchronized {
    entries.count(_._1._1 eq spark)
  }
}

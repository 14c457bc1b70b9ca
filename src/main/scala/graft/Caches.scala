package graft

import org.apache.spark.sql.DataFrame

/** Registry for DataFrames an operator persisted mid-plan (e.g. the shingle
  * stage inside Dedup.nearDupMinhash). Operators register the handle; the
  * harness (Verify/Bench) — or any long-lived session — calls releaseAll()
  * once the query's result is materialized, so repeated invocations never
  * accumulate cached blocks and spill files for the life of the context.
  *
  * CONTRACT: releaseAll() is one-query-at-a-time — it unpersists EVERY
  * registered frame, so two queries running concurrently in one session
  * would unpersist each other's in-flight intermediates (silent
  * recomputation; for pid-pinned frames like prefixSumCdf's, silent
  * wrong answers). scoped {} does NOT share that restriction: it tracks
  * only the frames ITS OWN THREAD registers while the block runs, so
  * concurrent queries on other threads are untouched — but two scopes
  * interleaving on ONE thread (hand-rolled async on a shared thread)
  * still see each other. A caller who wants fully manual lifetime passes
  * `cacheIntermediate = false` where offered and persists at the call
  * site.
  */
object Caches {
  private val handles = scala.collection.mutable.ListBuffer.empty[DataFrame]
  private val scopes =
    new ThreadLocal[List[scala.collection.mutable.ListBuffer[DataFrame]]] {
      override def initialValue: List[scala.collection.mutable.ListBuffer[DataFrame]] = Nil
    }

  /** Track a persisted frame; returns it for inline use. If the calling
    * thread is inside a [[scoped]] block, the innermost scope also claims
    * the frame for its own cleanup.
    */
  def register(df: DataFrame): DataFrame = synchronized {
    handles += df
    scopes.get() match {
      case innermost :: _ => innermost += df
      case Nil =>
    }
    df
  }

  /** Number of frames currently registered (test/diagnostic hook). */
  def registeredCount: Int = synchronized(handles.length)

  /** Unpersist (non-blocking) every tracked frame and clear the registry. */
  def releaseAll(): Unit = synchronized {
    handles.foreach(_.unpersist(false))
    handles.clear()
  }

  /** Scoped lifecycle for long-lived sessions: frames this thread
    * registers while `body` runs are unpersisted when it exits — normally
    * OR by exception (try/finally) — without touching frames registered
    * outside the block or by other threads (per-thread tracking, so a
    * concurrent query's registrations never land in this scope's
    * cleanup). Nesting-safe: an inner scope claims and cleans its own
    * frames first. The body MUST materialize everything it needs
    * (collect/write/count/localCheckpoint) — the returned value may not
    * hold a lazy plan over the scope's intermediates, or re-evaluation
    * recomputes them unpersisted (for prefixSumCdf that also re-samples
    * range bounds, which its pid-stability contract forbids). Library
    * callers who invoke exactQuantiles/valueCdf repeatedly wrap each
    * compute-and-materialize step here instead of calling releaseAll()
    * (which would clobber concurrent queries' intermediates).
    */
  def scoped[T](body: => T): T = {
    val mine = scala.collection.mutable.ListBuffer.empty[DataFrame]
    scopes.set(mine :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      synchronized {
        mine.foreach { df =>
          df.unpersist(false)
          handles -= df // reference identity: the exact registered handle
        }
      }
    }
  }

  // ---- pinned (cross-query) artifacts -----------------------------------

  private final case class Pin(df: DataFrame, var hits: Int)
  private val pins = scala.collection.mutable.LinkedHashMap.empty[String, Pin]

  /** Session-lifetime materialized artifact, keyed by a caller-chosen
    * string (convention: "what|dataDir") — the cross-QUERY complement to
    * [[register]]'s per-query lifecycle. [[releaseAll]] does NOT touch
    * pins: a pinned frame survives the harness's per-query cleanup so N
    * queries over the same derivation (the co-purchase edge list, a
    * near-dup pair table, the curated corpus remnant) share ONE build —
    * which is also the correct production shape: a real pipeline
    * materializes these between stages instead of re-deriving them per
    * consumer.
    *
    * Contract: `build` must be DETERMINISTIC for the key (results are
    * handed to every later caller verbatim) and BOUNDED (edge lists, pair
    * tables, shrunk remnants — never a raw fact table: pinning raw scans
    * would fake away IO cost that a 100 TB deployment actually pays).
    * The frame is persisted MEMORY_AND_DISK and materialized EAGERLY
    * inside a [[scoped]] block, so intermediates the build itself
    * registers (e.g. nearDupMinhash's shingle stage) are unpersisted the
    * moment the pin is materialized instead of leaking until the next
    * releaseAll. Keys are scoped to the owning SparkContext: an entry
    * whose session has stopped is rebuilt, never served stale.
    *
    * Build/hit counts are exported ([[pinnedStats]]) so a benchmark can
    * report which queries rode a pin — shared work must be auditable,
    * never silently amortized.
    */
  def pinned(key: String)(build: => DataFrame): DataFrame = synchronized {
    pins.get(key) match {
      case Some(p) if !p.df.sparkSession.sparkContext.isStopped =>
        p.hits += 1
        p.df
      case stale =>
        if (stale.isDefined) pins.remove(key) // stopped session: rebuild
        val df = scoped {
          val d = build.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          d.count() // eager: pay the build exactly once, on the first caller
          d
        }
        pins.put(key, Pin(df, 0))
        df
    }
  }

  /** (key -> hit count after the initial build) for every live pin. */
  def pinnedStats: Map[String, Int] =
    synchronized(pins.map { case (k, p) => k -> p.hits }.toMap)

  /** Unpersist and forget every pinned artifact (test teardown hook). */
  def releasePinned(): Unit = synchronized {
    pins.values.foreach(p => p.df.unpersist(false))
    pins.clear()
  }
}

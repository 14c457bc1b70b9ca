package graft

import org.apache.spark.sql.DataFrame

/** Registry for DataFrames an operator persisted mid-plan (e.g. the shingle
  * stage inside Dedup.nearDupMinhash). Operators register the handle; the
  * harness (Verify/Bench) — or any long-lived session — calls releaseAll()
  * once the query's result is materialized, so repeated invocations never
  * accumulate cached blocks and spill files for the life of the context.
  */
object Caches {
  private val handles = scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Track a persisted frame; returns it for inline use. */
  def register(df: DataFrame): DataFrame = synchronized { handles += df; df }

  /** Unpersist (non-blocking) every tracked frame and clear the registry. */
  def releaseAll(): Unit = synchronized {
    handles.foreach(_.unpersist(false))
    handles.clear()
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DeltaJoinSpec extends SparkSpec {
  import spark.implicits._

  // L(k, a): base keys 1..6; R(j, b): two rows per key 2..7
  private val lBase = Seq((1L, "a1"), (2L, "a2"), (3L, "a3"),
    (4L, "a4"), (5L, "a5"), (6L, "a6")).toDF("k", "a")
  private val rBase = (2L to 7L).flatMap(j => Seq((j, 10 * j), (j, 10 * j + 1)))
    .toDF("j", "b")

  // ΔL: insert key 7 (new match), insert a second row for key 2,
  // delete key 3 (kills its two join rows)
  private val dL = Seq((7L, "a7", 1L), (2L, "a2bis", 1L), (3L, "a3", -1L))
    .toDF("k", "a", "__w")
  // ΔR: insert a third row for key 7 (pairs with both old-missing and
  // newly-inserted key-7 left row via the ΔL⋈ΔR term), delete one of
  // key 5's rows
  private val dR = Seq((7L, 99L, 1L), (5L, 50L, -1L)).toDF("j", "b", "__w")

  private def applyDelta(base: DataFrame, d: DataFrame, cols: Seq[String]): DataFrame = {
    val ins = d.where(col("__w") === 1L).select(cols.map(col): _*)
    val del = d.where(col("__w") === -1L).select(cols.map(col): _*)
    base.select(cols.map(col): _*).unionByName(ins).exceptAll(del)
  }

  test("delta join equals full new-snapshot join minus full old-snapshot join") {
    val delta = Merge.deltaJoin(lBase, dL, rBase, dR, "k", "j")
    // weighted multiset from the delta path
    val got = delta.groupBy("k", "a", "j", "b")
      .agg(sum("__w").as("w")).where(col("w") =!= 0L)
      .as[(Long, String, Long, Long, Long)].collect().toSet

    val oldJ = lBase.join(rBase, col("k") === col("j"))
    val newJ = applyDelta(lBase, dL, Seq("k", "a"))
      .join(applyDelta(rBase, dR, Seq("j", "b")), col("k") === col("j"))
    val cnt = (df: DataFrame) => df.groupBy("k", "a", "j", "b")
      .agg(count(lit(1)).as("n"))
    val want = cnt(newJ).as("nw")
      .join(cnt(oldJ).as("od"),
        Seq("k", "a", "j", "b"), "full_outer")
      .select(col("k"), col("a"), col("j"), col("b"),
        (coalesce(col("nw.n"), lit(0L)) - coalesce(col("od.n"), lit(0L))).as("w"))
      .where(col("w") =!= 0L)
      .as[(Long, String, Long, Long, Long)].collect().toSet

    assert(got === want)
    assert(got.nonEmpty)
    // the ΔL⋈ΔR cross term must be present: (7, a7) × (7, 99)
    assert(got.contains((7L, "a7", 7L, 99L, 1L)))
    // deletes carry negative weight: key 3's join rows leave
    assert(got.count(_._5 < 0) >= 2)
  }

  test("empty deltas produce an empty join delta") {
    val empty = dL.where(lit(false))
    val emptyR = dR.where(lit(false))
    assert(Merge.deltaJoin(lBase, empty, rBase, emptyR, "k", "j").count() === 0L)
  }

  test("base tables are only joined against broadcast delta batches") {
    val plan = Merge.deltaJoin(lBase, dL, rBase, dR, "k", "j")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins against the delta batches:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a base-to-base sort-merge join must never appear:\n$plan")
  }
}

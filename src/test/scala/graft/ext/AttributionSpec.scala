package graft.ext

import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-01 09:${min % 60}%02d:00")

  // A: click->purchase ; B: view (no conversion) ; C: click->view->purchase
  // counts: START->click 2, START->view 1; click->CONV 1, click->view 1;
  //         view->NULL 1, view->CONV 1   (tot: START 3, click 2, view 2)
  private val events = Seq(
    (1L, ts(0), 10L, "click"), (1L, ts(1), 11L, "purchase"),
    (2L, ts(0), 20L, "view"),
    (3L, ts(0), 30L, "click"), (3L, ts(1), 31L, "view"),
    (3L, ts(2), 32L, "purchase")
  ).toDF("user_id", "ts", "event_id", "event_type")

  test("transition counts follow the journey contract") {
    val tc = Attribution.transitionCounts(events, "user_id", "ts",
        "event_id", "event_type", "purchase")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(tc(("START", "click")) === 2L)
    assert(tc(("START", "view")) === 1L)
    assert(tc(("click", "CONV")) === 1L)
    assert(tc(("click", "view")) === 1L)
    assert(tc(("view", "CONV")) === 1L)
    assert(tc(("view", "NULL")) === 1L)
    assert(tc.values.sum === 7L)
  }

  test("removal effects match the hand-solved absorbing chain") {
    val out = Attribution.removalEffects(events, "user_id", "ts",
        "event_id", "event_type", "purchase", Seq("click", "view"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // p_view = 1e9/2; p_click = (p_view + 1e9)/2; p_START = (2*p_click + p_view)/3
    assert(out("click")._1 === 666666666L)        // full-chain p in 1e-9
    assert(out("click")._3 === 0.75)              // click carries 3/4 credit
    assert(out("view")._3 === 0.5)
  }

  test("a conversion with no touches credits START->CONV and no channel") {
    val solo = Seq((9L, ts(0), 90L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Attribution.removalEffects(solo, "user_id", "ts",
        "event_id", "event_type", "purchase", Seq("click", "view"))
      .collect()
    assert(out.forall(_.getLong(1) === 1000000000L))  // p_full = 1
    assert(out.forall(_.getDouble(3) === 0.0))        // nothing to remove
  }

  test("touches after the last purchase form a non-converting journey") {
    val d = Seq(
      (5L, ts(0), 50L, "click"), (5L, ts(1), 51L, "purchase"),
      (5L, ts(2), 52L, "view")  // trailing touch, journey 1, never converts
    ).toDF("user_id", "ts", "event_id", "event_type")
    val tc = Attribution.transitionCounts(d, "user_id", "ts", "event_id",
        "event_type", "purchase")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(tc(("view", "NULL")) === 1L)
    assert(tc(("START", "view")) === 1L)
  }
}

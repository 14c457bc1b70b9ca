package graft.ext

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def d(day: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-${day + 1}%02d 12:00:00")

  // 4 users: A converts day 1, B converts day 2, C censored (horizon
  // day 3 from its day-0 start), D converts day 0 (first event is buy)
  private val events = Seq(
    (1L, d(0), "view"), (1L, d(1), "purchase"),
    (2L, d(0), "view"), (2L, d(2), "purchase"),
    (3L, d(0), "view"), (3L, d(3), "view"),
    (4L, d(0), "purchase")
  ).toDF("user_id", "ts", "event_type")

  test("KM curve matches the hand-computed product-limit estimator") {
    val out = Survival.kaplanMeier(events, "user_id", "ts", "event_type",
        "purchase")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // t=0: risk 4, event D  -> S = 1e9*3/4  = 750000000
    // t=1: risk 3, event A  -> S = .75*2/3  = 500000000
    // t=2: risk 2, event B  -> S = .5*1/2   = 250000000
    // t=3: risk 1, censor C -> S unchanged
    assert(out.toSeq === Seq(
      (0L, 4L, 1L, 0L, 750000000L),
      (1L, 3L, 1L, 0L, 500000000L),
      (2L, 2L, 1L, 0L, 250000000L),
      (3L, 1L, 0L, 1L, 250000000L)))
  }

  test("all-censored cohort keeps survival at 1") {
    val cens = Seq((1L, d(0), "view"), (2L, d(1), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = Survival.kaplanMeier(cens, "user_id", "ts", "event_type",
      "purchase").collect()
    assert(out.forall(_.getLong(4) === 1000000000L))
  }

  test("durations: censored users measure to the horizon") {
    val dur = Survival.durations(events, "user_id", "ts", "event_type",
        "purchase")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        r.getBoolean(2)))).toMap
    assert(dur(3L) === ((3L, false)))   // day 0 -> horizon day 3
    assert(dur(4L) === ((0L, true)))    // immediate conversion
  }

  test("logRank: identical schedules give chi2 ~ 0") {
    import org.apache.spark.sql.functions.col
    // both parities convert on the same days -> O1 = E1 exactly
    val same = Seq(
      (1L, d(0), "view"), (1L, d(1), "purchase"),
      (2L, d(0), "view"), (2L, d(1), "purchase"),
      (3L, d(0), "view"), (3L, d(2), "purchase"),
      (4L, d(0), "view"), (4L, d(2), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val r = Survival.logRank(same, "user_id", "ts", "event_type",
      "purchase", u => u % 2 === 1).head()
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(math.abs(r.getAs[Long]("o1").toDouble -
      r.getAs[Double]("e1")) < 1e-6)
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-6)
  }

  test("logRank: hand-computed single-event-day statistic") {
    // day 1: group A (even ids 2, 4) one event, group B (1, 3) none;
    // all 4 at risk. d=1, n1=2, n=4 -> e1 = 0.5, v = 1*(.5)(.5)*3/3 = .25
    // chi2 = (1 - 0.5)^2 / 0.25 = 1.0
    val ev = Seq(
      (1L, d(0), "view"), (2L, d(0), "view"),
      (3L, d(0), "view"), (4L, d(0), "view"),
      (2L, d(1), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val r = Survival.logRank(ev, "user_id", "ts", "event_type",
      "purchase", u => u % 2 === 1).head()
    assert(r.getAs[Long]("o1") === 1L)
    assert(r.getAs[Double]("e1") === 0.5)
    assert(r.getAs[Double]("chi2") === 1.0)
  }
}

package graft

import graft.operators.{Funnel, Resample}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Funnel ordering semantics and EWMA fold exactness. */
class FunnelSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("funnel: order matters — out-of-order stages don't count") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "signup", ts(1)), (1L, "view", ts(2)), (1L, "buy", ts(3)),
      // user 2: buy BEFORE view → reaches only stage 2
      (2L, "signup", ts(1)), (2L, "buy", ts(2)), (2L, "view", ts(3)),
      // user 3: never signs up → reaches nothing
      (3L, "view", ts(1)), (3L, "buy", ts(2)),
      // user 4: signup only, with noise events ignored
      (4L, "noise", ts(0)), (4L, "signup", ts(5))
    ).toDF("user_id", "event_type", "ts")
    val r = Funnel.funnel(ev, "user_id", "event_type", "ts",
      Seq("signup", "view", "buy")).head
    assert(r.getAs[Long]("n_signup") == 3) // users 1, 2, 4
    assert(r.getAs[Long]("n_view") == 2)   // users 1, 2
    assert(r.getAs[Long]("n_buy") == 1)    // user 1 only
  }

  test("funnel: a later first-stage event can't resurrect order") {
    // view(1) signup(2) view(3): signup then the SECOND view → stage 2
    val ev = Seq(
      (1L, "view", ts(1)), (1L, "signup", ts(2)), (1L, "view", ts(3))
    ).toDF("user_id", "event_type", "ts")
    val r = Funnel.funnel(ev, "user_id", "event_type", "ts",
      Seq("signup", "view")).head
    assert(r.getAs[Long]("n_signup") == 1 && r.getAs[Long]("n_view") == 1)
  }

  test("funnel guards: empty and duplicate stage lists rejected") {
    val ev = Seq((1L, "a", ts(1))).toDF("user_id", "event_type", "ts")
    intercept[IllegalArgumentException] {
      Funnel.funnel(ev, "user_id", "event_type", "ts", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(ev, "user_id", "event_type", "ts", Seq("a", "a"))
    }
  }

  test("ewma: hand-computed recursion, null values excluded") {
    val df = Seq(
      (1L, ts(1), Some(10.0)), (1L, ts(2), None), (1L, ts(3), Some(20.0)),
      (1L, ts(4), Some(30.0)),
      (2L, ts(1), Some(5.0)) // single point: ewma = the point
    ).toDF("k", "ts", "v")
    val got = Resample.ewma(df, "k", "ts", "v", 0.25)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // user 1: e=10 → 0.25*20+0.75*10=12.5 → 0.25*30+0.75*12.5=16.875
    assert(got(1L) == (3L, 16.875))
    assert(got(2L) == (1L, 5.0))
  }

  test("ewma is invariant under repartitioning") {
    val df = (0 until 200).map(i =>
      ((i % 5).toLong, ts(i % 60), (i * 37 % 101).toDouble))
      .toDF("k", "ts", "v")
    val a = Resample.ewma(df, "k", "ts", "v", 0.3)
    val b = Resample.ewma(df.repartition(7), "k", "ts", "v", 0.3)
    assertBagEqual(a, b)
  }
}

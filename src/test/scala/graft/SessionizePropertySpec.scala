package graft

import org.apache.spark.sql.functions._
import graft.operators.Sessionize

/** Property tests for the islands algorithm (SURVEY §5 item 4): over random
  * mode/target sequences, regions partition the kept rows into contiguous,
  * key-constant, densely-numbered runs separated by justified boundaries.
  * (Seeded random trials; scalatest+scalacheck-bridge not in the offline
  * dependency cache, so trials are explicit loops.)
  */
class SessionizePropertySpec extends SparkSpec {
  import spark.implicits._

  test("regions partition kept rows into contiguous key-constant runs with margin gaps") {
    for (trial <- 0 until 12) {
      val rng  = new scala.util.Random(100 + trial)
      val rows = List.fill(60)((rng.nextInt(3) * 2, s"t${rng.nextInt(3) + 1}")) // modes 0/2/4
      val df = rows.zipWithIndex
        .map { case ((m, t), i) => (i.toLong, m, t) }
        .toDF("idx", "mode", "target")
        .filter($"mode".isin(2, 4))
      val out = Sessionize
        .byKeyChangeWithMargin(df, "idx", Seq("mode", "target"), margin = 2)
        .select("idx", "mode", "target", "region_id")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1)

      if (out.nonEmpty) {
        val ids = out.map(_._4)
        assert(ids.min === 0L, s"trial $trial: ids start at 0")
        assert(ids.distinct.sorted === (0L to ids.max).toArray, s"trial $trial: dense ids")
        out.sliding(2).foreach {
          case Array((i1, m1, t1, r1), (i2, m2, t2, r2)) =>
            if (r1 == r2) {
              assert(m1 == m2 && t1 == t2, s"trial $trial: key constant within region")
              assert(i2 - i1 <= 2, s"trial $trial: gap within region respects margin")
            } else {
              assert(r2 == r1 + 1, s"trial $trial: region ids increase by 1")
              assert(m1 != m2 || t1 != t2 || i2 - i1 > 2, s"trial $trial: boundary justified")
            }
          case _ => ()
        }
      }
    }
  }

  test("time-gap sessions: within-session gaps <= threshold, boundaries exceed it") {
    for (trial <- 0 until 8) {
      val rng     = new scala.util.Random(200 + trial)
      val offsets = List.fill(40)(rng.nextLong(20000L)).distinct
      val df = offsets.zipWithIndex
        .map { case (off, i) => (i.toLong, new java.sql.Timestamp(1700000000000L + off * 1000)) }
        .toDF("id", "ts")
      val out = Sessionize
        .byTimeGap(df, "ts", gapSeconds = 1800)
        .select("ts", "session_id")
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
        .sortBy(_._1)
      out.sliding(2).foreach {
        case Array((a, s1), (b, s2)) =>
          if (s1 == s2) assert((b - a) / 1000 <= 1800, s"trial $trial")
          else assert((b - a) / 1000 > 1800, s"trial $trial")
        case _ => ()
      }
    }
  }
}

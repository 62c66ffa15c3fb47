package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Co-located join via bucketing (SURVEY §7 / scale design): both fact
  * tables bucketed by the join key join WITHOUT a shuffle exchange — the
  * 100 TB plan shape for the recurring orders⋈lineitem join.
  */
class BucketingSpec extends SparkSpec {

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // force AQE final plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    plan.collect { case _: ShuffleExchangeExec => 1 }.sum
  }

  test("bucketed tables join without shuffle; unbucketed join shuffles both sides") {
    // suites share one JVM session: builder confs are ignored on reuse, so
    // set runtime confs explicitly (and restore after)
    val s = spark
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
      .map(k => k -> s.conf.getOption(k)).toMap
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    s.conf.set("spark.sql.adaptive.enabled", "false")        // deterministic plan
    try {
    // the in-memory catalog forgets tables across JVMs but their warehouse
    // dirs persist; clear both before creating
    Seq("li_b", "o_b").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    val li = Tables.lineitem(s, sf()).select("l_orderkey", "l_quantity")
    val o  = Tables.orders(s, sf()).select("o_orderkey", "o_orderpriority")

    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_b")

    val bucketed = s.table("li_b")
      .join(s.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
    val plain = li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()

    val bucketedShuffles = countShuffles(bucketed)
    val plainShuffles    = countShuffles(plain)
    // plain: shuffle both join sides + aggregate; bucketed: aggregate only
    assert(plainShuffles >= 3, s"plain join should shuffle, saw $plainShuffles")
    assert(bucketedShuffles === 1, s"bucketed join must not shuffle join inputs, saw $bucketedShuffles")
    } finally {
      saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None)    => s.conf.unset(k)
      }
      s.sql("DROP TABLE IF EXISTS li_b")
      s.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}

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
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
  }
}

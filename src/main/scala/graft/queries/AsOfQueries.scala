package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Portable._
import graft.operators.AsOfJoin

/** As-of join coverage: for every purchase, the user's most recent signup
  * at or before the purchase. The Spark side is the union+window operator
  * (single shuffle per side, no range-pair blowup); the oracle is the
  * declarative correlated form — identical semantics, so the hash match
  * also validates the operator's tie-break rules.
  */
object AsOfQueries {

  type Q = (SparkSession, String) => DataFrame

  private val q42: Q = (s, dir) => {
    val events    = Tables.events(s, dir)
    val purchases = events.filter(col("event_type") === "purchase")
    val signups = events
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
    AsOfJoin
      .lastPrior(
        purchases.select(col("event_id"), col("user_id"), col("ts"), col("value")),
        signups,
        keyCols = Seq("user_id"),
        tsCol = "ts",
        rightIdCol = "signup_id",
        rightVals = Seq("signup_id"))
      .select(
        col("event_id"),
        col("user_id"),
        tsStr(col("ts")).as("purchase_ts"),
        col("asof_signup_id").as("signup_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("asof_ts"))).as("age_s"))
      .orderBy(col("event_id"))
  }

  private val q42Sql =
    """SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  (SELECT s.event_id FROM events s
      |   WHERE s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts
      |   ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS signup_id,
      |  date_diff('second',
      |    (SELECT s.ts FROM events s
      |     WHERE s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts
      |     ORDER BY s.ts DESC, s.event_id DESC LIMIT 1),
      |    p.ts) AS age_s
      |FROM events p WHERE p.event_type = 'purchase'
      |ORDER BY p.event_id""".stripMargin

  /** As-of with tolerance (pandas merge_asof semantics): the latest prior
    * signup only counts within 7 days; an older nearest match NULLS rather
    * than falling back. */
  private val q47: Q = (s, dir) => {
    val events    = Tables.events(s, dir)
    val purchases = events.filter(col("event_type") === "purchase")
    val signups = events
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
    AsOfJoin
      .lastPrior(
        purchases.select(col("event_id"), col("user_id"), col("ts")),
        signups,
        keyCols = Seq("user_id"),
        tsCol = "ts",
        rightIdCol = "signup_id",
        rightVals = Seq("signup_id"),
        toleranceSeconds = Some(7L * 24 * 3600))
      .select(
        col("event_id"),
        col("user_id"),
        tsStr(col("ts")).as("purchase_ts"),
        col("asof_signup_id").as("signup_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("asof_ts"))).as("age_s"))
      .orderBy(col("event_id"))
  }

  private val q47Sql =
    """WITH m AS (
      |  SELECT p.event_id, p.user_id, p.ts,
      |    (SELECT s.event_id FROM events s
      |     WHERE s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts
      |     ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS signup_id,
      |    (SELECT s.ts FROM events s
      |     WHERE s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts
      |     ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS signup_ts
      |  FROM events p WHERE p.event_type = 'purchase')
      |SELECT event_id, user_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  CASE WHEN date_diff('second', signup_ts, ts) <= 604800 THEN signup_id END AS signup_id,
      |  CASE WHEN date_diff('second', signup_ts, ts) <= 604800
      |       THEN date_diff('second', signup_ts, ts) END AS age_s
      |FROM m
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, Q] =
    Map("q42_asof_join" -> q42, "q47_asof_tolerance" -> q47)
  val oracles: Map[String, String] =
    Map("q42_asof_join" -> q42Sql, "q47_asof_tolerance" -> q47Sql)
}

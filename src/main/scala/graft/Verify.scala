package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // integer-validated: these interpolate into local[N] masters AND into
    // raw JSON (DETERMINISM.json) — a stray "*" must not inject either
    def intEnv(name: String, default: Int): Int =
      sys.env.get(name).flatMap(_.toIntOption).filter(_ > 0).getOrElse(default)
    val cpus = intEnv("SPARK_GRAFT_CPUS", 32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev iteration aid: SPARK_GRAFT_ONLY=q82,q63 dumps just those
    // queries; unset (the driver) dumps everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()

    // partition-independence gate folded into the wrap (r10 verdict #7):
    // recompute EVERY query under a different thread/shuffle-partition
    // count and compare against the dump above, so each round's driver run
    // carries determinism evidence without a separate dev/determinism.py
    // sweep. Opt-out: SPARK_GRAFT_NO_DETERMINISM=1.
    if (!sys.env.contains("SPARK_GRAFT_NO_DETERMINISM")) {
      val altCpus = intEnv("SPARK_GRAFT_DET_CPUS", 7)
      val spark2 = SparkSession.builder()
        .master(s"local[$altCpus]")
        .config("spark.sql.shuffle.partitions", altCpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark2.sparkContext.setLogLevel("WARN")
      // order-independent content hash: columns sorted by name, every row
      // rendered null-safe, row strings sorted, then one md5 — the same
      // normalization dev/determinism.py applies
      def contentHash(df: org.apache.spark.sql.DataFrame): String = {
        val cols = df.columns.sorted
        val rows = df
          .select(cols.map(c => org.apache.spark.sql.functions.col(c).cast("string")): _*)
          .collect()
          .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("|"))
          .sorted
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.foreach(s => md.update(s.getBytes("UTF-8")))
        md.digest().map(b => f"$b%02x").mkString
      }
      val results = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
        .map { case (name, fn) =>
          val verdict =
            try {
              val h32 = contentHash(spark2.read.parquet(s"$outDir/$name"))
              val h7  = contentHash(fn(spark2, sfDir))
              if (h32 == h7) "true" else "false"
            } catch { case e: Throwable => q(s"err: ${e.getMessage}") }
          name -> verdict
        }
      val detJson = results.map { case (k, v) => s"${q(k)}: $v" }
        .mkString(s"""{"cpus": [$cpus, $altCpus], "queries": {""", ",", "}}")
      Files.writeString(Paths.get("DETERMINISM.json"), detJson)
      val bad = results.filterNot(_._2 == "true")
      System.err.println(
        s"[verify] determinism: ${results.size - bad.size}/${results.size} identical " +
          s"across local[$cpus] vs local[$altCpus]" +
          (if (bad.nonEmpty) s"; DIFFER: ${bad.map(_._1).mkString(", ")}" else ""))
      spark2.stop()
    }
  }
}

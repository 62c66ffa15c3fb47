package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Portable._
import graft.operators.{Grid, Masking}
import graft.operators.Grid.GridSpec

/** Grid / geometry / interpolation coverage (SURVEY §2.6) re-expressed over
  * the driver tables: lineitem's (l_discount, l_tax) plane stands in for
  * (lon, lat), part boxes stand in for sounding footprints.
  */
object GridQueries {

  type Q = (SparkSession, String) => DataFrame

  /** G1: mesh generation — 40×25 global-style grid with linspace coords. */
  private val q18: Q = (s, _) =>
    Grid
      .generate(s, GridSpec(-180.0, 180.0, 40, -90.0, 90.0, 25))
      .select(col("x_idx").as("lon_idx"), col("y_idx").as("lat_idx"), col("x").as("lon"), col("y").as("lat"))
      .orderBy(col("lon_idx"), col("lat_idx"))

  private val q18Sql =
    """SELECT CAST(i AS INT) AS lon_idx, CAST(j AS INT) AS lat_idx,
      |  -180.0 + i * ((180.0 - -180.0) / (40 - 1)) AS lon,
      |  -90.0 + j * ((90.0 - -90.0) / (25 - 1)) AS lat
      |FROM range(0, 40) t(i) CROSS JOIN range(0, 25) s(j)
      |ORDER BY lon_idx, lat_idx""".stripMargin

  /** Scatter points: per distinct (l_discount, l_tax) cell, deterministic
    * mean of extended price (the "sounding values" being gridded). */
  private def scatterPoints(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .groupBy(col("l_discount").as("px"), col("l_tax").as("py"))
      .agg(avg2fast(col("l_extendedprice")).as("pv"))

  private val scatterSql =
    """SELECT l_discount AS px, l_tax AS py,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS pv
      |FROM lineitem GROUP BY l_discount, l_tax""".stripMargin

  /** G3 (nearest): 16×16 grid over the discount×tax plane, each pixel takes
    * the nearest scatter point's value; rank-1 with deterministic ties. */
  private val q19: Q = (s, dir) =>
    Grid
      .interpolateNearest(
        Grid.generate(s, GridSpec(0.0, 0.1, 16, 0.0, 0.08, 16)),
        scatterPoints(s, dir))
      .select(col("x_idx"), col("y_idx"), col("x"), col("y"), col("value"))
      .orderBy(col("x_idx"), col("y_idx"))

  private val q19Sql =
    s"""WITH pts AS ($scatterSql),
      |grid AS (
      |  SELECT CAST(i AS INT) AS x_idx, CAST(j AS INT) AS y_idx,
      |    0.0 + i * ((0.1 - 0.0) / (16 - 1)) AS x,
      |    0.0 + j * ((0.08 - 0.0) / (16 - 1)) AS y
      |  FROM range(0, 16) t(i) CROSS JOIN range(0, 16) s(j)),
      |d AS (
      |  SELECT x_idx, y_idx, x, y, pv,
      |    ROW_NUMBER() OVER (PARTITION BY x_idx, y_idx
      |      ORDER BY (x-px)*(x-px) + (y-py)*(y-py), px, py) AS rn
      |  FROM grid CROSS JOIN pts)
      |SELECT x_idx, y_idx, x, y, pv AS value
      |FROM d WHERE rn = 1 ORDER BY x_idx, y_idx""".stripMargin

  /** G3 (smooth): inverse-distance-weighted interpolation, decimal-exact
    * weighted sums. */
  private val q20: Q = (s, dir) =>
    Grid
      .interpolateIDW(
        Grid.generate(s, GridSpec(0.0, 0.1, 16, 0.0, 0.08, 16)),
        scatterPoints(s, dir))
      .select(col("x_idx"), col("y_idx"), col("value"), col("n_points"))
      .orderBy(col("x_idx"), col("y_idx"))

  private val q20Sql =
    s"""WITH pts AS ($scatterSql),
      |grid AS (
      |  SELECT CAST(i AS INT) AS x_idx, CAST(j AS INT) AS y_idx,
      |    0.0 + i * ((0.1 - 0.0) / (16 - 1)) AS x,
      |    0.0 + j * ((0.08 - 0.0) / (16 - 1)) AS y
      |  FROM range(0, 16) t(i) CROSS JOIN range(0, 16) s(j)),
      |j AS (
      |  SELECT x_idx, y_idx, px, py,
      |    1.0 / (0.0001 + ((x-px)*(x-px) + (y-py)*(y-py))) AS w, pv
      |  FROM grid CROSS JOIN pts)
      |SELECT x_idx, y_idx,
      |  list_reduce(list(w * pv ORDER BY px, py), (a,b) -> a + b) /
      |    list_reduce(list(w ORDER BY px, py), (a,b) -> a + b) AS value,
      |  COUNT(*) AS n_points
      |FROM j GROUP BY x_idx, y_idx ORDER BY x_idx, y_idx""".stripMargin

  /** M1/M2/M4: footprint masking — part boxes over a 33×26 pixel grid;
    * per-pixel any-hit mask, hit count, first-writer-wins annotation. */
  private val q21: Q = (s, dir) => {
    val pixels = Grid.generate(s, GridSpec(0.0, 160.0, 33, 0.0, 100.0, 26))
    val boxes = Tables
      .part(s, dir)
      .select(
        col("p_partkey").as("fid"),
        (col("p_size") * lit(3.0)).as("cx"),
        (col("p_retailprice") - lit(900.0)).as("cy"),
        (lit(1.0) + (col("p_partkey") % 5)).as("halfX"),
        (lit(1.0) + (col("p_partkey") % 5)).as("halfY"))
    Masking
      .maskAnnotate(pixels, boxes)
      .orderBy(col("x_idx"), col("y_idx"))
  }

  private val q21Sql =
    """WITH grid AS (
      |  SELECT CAST(i AS INT) AS x_idx, CAST(j AS INT) AS y_idx,
      |    0.0 + i * ((160.0 - 0.0) / (33 - 1)) AS x,
      |    0.0 + j * ((100.0 - 0.0) / (26 - 1)) AS y
      |  FROM range(0, 33) t(i) CROSS JOIN range(0, 26) s(j)),
      |boxes AS (
      |  SELECT p_partkey AS fid, p_size * 3.0 AS cx, p_retailprice - 900.0 AS cy,
      |    1.0 + (p_partkey % 5) AS half
      |  FROM part)
      |SELECT x_idx, y_idx, COUNT(*) AS n_hits, MIN(fid) AS first_fid
      |FROM grid JOIN boxes
      |  ON ABS(x - cx) <= half AND ABS(y - cy) <= half
      |GROUP BY x_idx, y_idx
      |ORDER BY x_idx, y_idx""".stripMargin

  val queries: Map[String, Q] = Map(
    "q18_grid_generate"  -> q18,
    "q19_interp_nearest" -> q19,
    "q20_interp_idw"     -> q20,
    "q21_footprint_mask" -> q21
  )

  val oracles: Map[String, String] = Map(
    "q18_grid_generate"  -> q18Sql,
    "q19_interp_nearest" -> q19Sql,
    "q20_interp_idw"     -> q20Sql,
    "q21_footprint_mask" -> q21Sql
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.domain.{GlobalPipeline, Oco2Pipeline, Pipeline, TargetCatalog}
import graft.domain.TargetCatalog.Target
import graft.sources.SyntheticGranule
import graft.sources.SyntheticGranule.sounding

/** The domain showcase: full satellite observation pipeline (sessionize →
  * QF → catalog join → grid → interpolate → mask → long form) over a
  * deterministic synthetic granule.
  *
  * q31 runs the nearest-mode pipeline and carries a FULL DuckDB oracle: the
  * granule is deterministic arithmetic, the per-target 16×16 grid is the
  * linspace formula, nearest interpolation is a rank-1 by (d², index), and
  * — because the demo footprints are axis-aligned squares — the ray-cast
  * mask reduces exactly to the half-open box [L,R)×[B,T) on the
  * centroid-scaled vertices, which plain SQL expresses. (Linear/cubic
  * remain spec-gated: DelaunaySpec/PipelineSpec.) q32 (global variant)
  * stays rows-only: first-writer-wins over the global mesh is covered by
  * MissionVariantsSpec.
  */
object DomainQueries {

  type Q = (SparkSession, String) => DataFrame

  def demoGranule(s: SparkSession): DataFrame =
    SyntheticGranule.toDF(
      s,
      (0 until 40).map(i =>
        sounding(i, 41.0 + 0.02 * (i % 20), 11.0 + 0.04 * (i % 20), mode = 4,
          target = "fossil0001", xco2 = 400.0 + (i % 7), qf = i % 5 min 1)) ++
        (40 until 70).map(i =>
          sounding(i, -0.8 + 0.05 * (i - 40), -4.8 + 0.05 * (i - 40), mode = 2,
            target = "volcano0002", xco2 = 410.0 + (i % 3))))

  def demoCatalog(s: SparkSession): DataFrame =
    TargetCatalog.toDF(
      s,
      Seq(
        Target("fossil0001", "Plant A", 10.0, 40.0, 12.0, 42.0),
        Target("volcano0002", "Volcano B", -5.0, -1.0, -3.0, 1.0)))

  /** Runs the pipeline AND round-trips the result through the idempotent
    * product store (write partition-overwrite, read back) so the sink layer
    * is exercised at the driver surface. */
  private val q31: Q = (s, _) => {
    val out = Pipeline.process(
      demoGranule(s), demoCatalog(s),
      Pipeline.Config(gridN = 16, method = "nearest"))
    // per-run store dir: a fixed shared path races when two driver
    // processes (e.g. parallel Verify sweeps) overwrite/read concurrently;
    // scratchDir registers exit-time cleanup so repeated runs don't leak
    val path = graft.Tables.scratchDir("graft_demo_store").resolve("store").toString
    graft.sinks.ProductStore.appendIdempotent(out, path)
    graft.sinks.ProductStore
      .read(s, path)
      .drop("day")
      // portable timestamp form (oracle-portability law: format, don't emit)
      .withColumn("time", date_format(col("time"), "yyyy-MM-dd HH:mm:ss"))
      .orderBy(col("target_id"), col("variable"), col("lat_idx"), col("lon_idx"))
  }

  /** Re-derivation of q31 in ANSI SQL: same deterministic granule, same QF
    * rule, per-target linspace grid, rank-1 nearest with (d², index)
    * tie-break, centroid-scaled axis-aligned mask as a half-open box. All
    * literals cast to DOUBLE so DuckDB's decimal literals don't diverge
    * from Spark's double arithmetic. */
  private val q31Sql =
    """WITH s AS (
      |  SELECT i AS sidx,
      |    CASE WHEN i < 40 THEN CAST(41.0 AS DOUBLE) + CAST(0.02 AS DOUBLE) * (i % 20)
      |         ELSE CAST(-0.8 AS DOUBLE) + CAST(0.05 AS DOUBLE) * (i - 40) END AS slat,
      |    CASE WHEN i < 40 THEN CAST(11.0 AS DOUBLE) + CAST(0.04 AS DOUBLE) * (i % 20)
      |         ELSE CAST(-4.8 AS DOUBLE) + CAST(0.05 AS DOUBLE) * (i - 40) END AS slon,
      |    CASE WHEN i < 40 THEN 'fossil0001' ELSE 'volcano0002' END AS target_id,
      |    CASE WHEN i < 40 THEN CAST(400.0 AS DOUBLE) + (i % 7)
      |         ELSE CAST(410.0 AS DOUBLE) + (i % 3) END AS xco2,
      |    CAST(0.5 AS DOUBLE) AS xco2_uncertainty,
      |    CASE WHEN i < 40 THEN LEAST(i % 5, 1) ELSE 0 END AS qf
      |  FROM range(0, 70) t(i)),
      |good AS (SELECT * FROM s WHERE qf = 0),
      |cat AS (
      |  SELECT * FROM (VALUES
      |    ('fossil0001', CAST(10.0 AS DOUBLE), CAST(40.0 AS DOUBLE),
      |                   CAST(12.0 AS DOUBLE), CAST(42.0 AS DOUBLE)),
      |    ('volcano0002', CAST(-5.0 AS DOUBLE), CAST(-1.0 AS DOUBLE),
      |                    CAST(-3.0 AS DOUBLE), CAST(1.0 AS DOUBLE)))
      |    AS t(target_id, min_lon, min_lat, max_lon, max_lat)),
      |px AS (
      |  SELECT c.target_id, xi.i AS lon_idx, yi.i AS lat_idx,
      |    c.min_lon + xi.i * ((c.max_lon - c.min_lon) / 15) AS lon,
      |    c.min_lat + yi.i * ((c.max_lat - c.min_lat) / 15) AS lat
      |  FROM cat c, range(0, 16) xi(i), range(0, 16) yi(i)),
      |interp AS (
      |  SELECT * FROM (
      |    SELECT p.target_id, p.lon_idx, p.lat_idx, p.lon, p.lat,
      |      g.xco2, g.xco2_uncertainty,
      |      ROW_NUMBER() OVER (
      |        PARTITION BY p.target_id, p.lon_idx, p.lat_idx
      |        ORDER BY (p.lon - g.slon) * (p.lon - g.slon)
      |               + (p.lat - g.slat) * (p.lat - g.slat), g.sidx) AS rn
      |    FROM px p JOIN good g ON g.target_id = p.target_id)
      |  WHERE rn = 1),
      |fp AS (
      |  SELECT target_id,
      |    cx + ((slon - h) - cx) * CAST(1.0 AS DOUBLE) AS sxl,
      |    cx + ((slon + h) - cx) * CAST(1.0 AS DOUBLE) AS sxr,
      |    cy + ((slat - h) - cy) * CAST(1.0 AS DOUBLE) AS syb,
      |    cy + ((slat + h) - cy) * CAST(1.0 AS DOUBLE) AS syt
      |  FROM (
      |    SELECT *,
      |      (((CAST(0.0 AS DOUBLE) + (slon - h)) + (slon + h)) + (slon + h) + (slon - h)) / 4 AS cx,
      |      (((CAST(0.0 AS DOUBLE) + (slat - h)) + (slat - h)) + (slat + h) + (slat + h)) / 4 AS cy
      |    FROM (SELECT g.*, CAST(0.6 AS DOUBLE) AS h FROM good g))),
      |mask AS (
      |  SELECT DISTINCT p.target_id, p.lon_idx, p.lat_idx
      |  FROM px p JOIN fp f ON f.target_id = p.target_id
      |    AND p.lon >= f.sxl AND p.lon < f.sxr
      |    AND p.lat >= f.syb AND p.lat < f.syt)
      |SELECT i.target_id, '2023-06-15 00:00:00' AS time,
      |  i.lat_idx, i.lon_idx, i.lat, i.lon, v.variable,
      |  CASE v.variable WHEN 'xco2' THEN i.xco2 ELSE i.xco2_uncertainty END AS value
      |FROM interp i
      |  JOIN mask m ON m.target_id = i.target_id
      |    AND m.lon_idx = i.lon_idx AND m.lat_idx = i.lat_idx,
      |  (VALUES ('xco2'), ('xco2_uncertainty')) v(variable)
      |ORDER BY i.target_id, v.variable, i.lat_idx, i.lon_idx""".stripMargin

  /** Global-product variant + multi-mission merge: R4 sessionization,
    * per-pixel first-writer-wins annotation, sparse global mesh indices;
    * merged with an OCO-2-style product under a mission discriminator. */
  private val q32: Q = (s, _) => {
    val oco3 = GlobalPipeline.process(demoGranule(s))
    val oco2 = Oco2Pipeline.process(
      demoGranule(s).drop("target_id").withColumn("target_id", lit("")),
      demoCatalog(s))
    GlobalPipeline
      .mergeMissions(Map("oco3_global" -> oco3, "oco2" -> oco2))
      // portable timestamp form (oracle-portability law: format, don't emit)
      .withColumn("time", date_format(col("time"), "yyyy-MM-dd HH:mm:ss"))
      .orderBy(col("mission"), col("variable"), col("lat_idx"), col("lon_idx"))
  }

  /** Re-derivation of q32 in ANSI SQL. The demo regions are 1:1 with
    * operation_mode (one SAM run, one Target run), so mode serves as the
    * region key. Global pixels come from the covered-index-range formula
    * over the 360×180 default mesh; OCO-2 associates its single region to
    * the catalog by squared-distance argmin (monotone-equivalent to the
    * engine's hypot) with the bbox-intersects validity check; both products
    * interpolate nearest and mask by the half-open scaled-footprint box
    * (same analytic reduction as q31). First-writer-wins is a rank over
    * region order — a no-op here (disjoint extents) but derived anyway. */
  private val q32Sql =
    """WITH s AS (
      |  SELECT i AS sidx,
      |    CASE WHEN i < 40 THEN CAST(41.0 AS DOUBLE) + CAST(0.02 AS DOUBLE) * (i % 20)
      |         ELSE CAST(-0.8 AS DOUBLE) + CAST(0.05 AS DOUBLE) * (i - 40) END AS slat,
      |    CASE WHEN i < 40 THEN CAST(11.0 AS DOUBLE) + CAST(0.04 AS DOUBLE) * (i % 20)
      |         ELSE CAST(-4.8 AS DOUBLE) + CAST(0.05 AS DOUBLE) * (i - 40) END AS slon,
      |    CASE WHEN i < 40 THEN 4 ELSE 2 END AS mode,
      |    CASE WHEN i < 40 THEN 'fossil0001' ELSE 'volcano0002' END AS target_id,
      |    CASE WHEN i < 40 THEN CAST(400.0 AS DOUBLE) + (i % 7)
      |         ELSE CAST(410.0 AS DOUBLE) + (i % 3) END AS xco2,
      |    CAST(0.5 AS DOUBLE) AS xco2_uncertainty,
      |    CASE WHEN i < 40 THEN LEAST(i % 5, 1) ELSE 0 END AS qf
      |  FROM range(0, 70) t(i)),
      |good AS (SELECT g.*, CAST(0.6 AS DOUBLE) AS h FROM s g WHERE qf = 0),
      |fp AS (
      |  SELECT mode,
      |    cx + ((slon - h) - cx) * CAST(1.0 AS DOUBLE) AS sxl,
      |    cx + ((slon + h) - cx) * CAST(1.0 AS DOUBLE) AS sxr,
      |    cy + ((slat - h) - cy) * CAST(1.0 AS DOUBLE) AS syb,
      |    cy + ((slat + h) - cy) * CAST(1.0 AS DOUBLE) AS syt
      |  FROM (
      |    SELECT *,
      |      (((CAST(0.0 AS DOUBLE) + (slon - h)) + (slon + h)) + (slon + h) + (slon - h)) / 4 AS cx,
      |      (((CAST(0.0 AS DOUBLE) + (slat - h)) + (slat - h)) + (slat + h) + (slat + h)) / 4 AS cy
      |    FROM good)),
      |-- ===== OCO-3 global product (mode = region key) =====
      |ext AS (
      |  SELECT mode, MIN(target_id) AS target_id,
      |    MIN(slon - h) AS fminx, MAX(slon + h) AS fmaxx,
      |    MIN(slat - h) AS fminy, MAX(slat + h) AS fmaxy
      |  FROM good GROUP BY mode),
      |idxr AS (
      |  SELECT mode, target_id,
      |    GREATEST(0, CAST(CEIL((fminx - CAST(-180.0 AS DOUBLE))
      |      / ((CAST(180.0 AS DOUBLE) - CAST(-180.0 AS DOUBLE)) / (360 - 1))) AS INT)) AS xlo,
      |    LEAST(359, CAST(FLOOR((fmaxx - CAST(-180.0 AS DOUBLE))
      |      / ((CAST(180.0 AS DOUBLE) - CAST(-180.0 AS DOUBLE)) / (360 - 1))) AS INT)) AS xhi,
      |    GREATEST(0, CAST(CEIL((fminy - CAST(-90.0 AS DOUBLE))
      |      / ((CAST(90.0 AS DOUBLE) - CAST(-90.0 AS DOUBLE)) / (180 - 1))) AS INT)) AS ylo,
      |    LEAST(179, CAST(FLOOR((fmaxy - CAST(-90.0 AS DOUBLE))
      |      / ((CAST(90.0 AS DOUBLE) - CAST(-90.0 AS DOUBLE)) / (180 - 1))) AS INT)) AS yhi
      |  FROM ext),
      |px3 AS (
      |  SELECT r.mode, r.target_id, xs.ix AS lon_idx, ys.iy AS lat_idx,
      |    CAST(-180.0 AS DOUBLE) + xs.ix * ((CAST(180.0 AS DOUBLE) - CAST(-180.0 AS DOUBLE)) / (360 - 1)) AS lon,
      |    CAST(-90.0 AS DOUBLE) + ys.iy * ((CAST(90.0 AS DOUBLE) - CAST(-90.0 AS DOUBLE)) / (180 - 1)) AS lat
      |  FROM idxr r
      |    CROSS JOIN UNNEST(generate_series(r.xlo, r.xhi)) AS xs(ix)
      |    CROSS JOIN UNNEST(generate_series(r.ylo, r.yhi)) AS ys(iy)
      |  WHERE r.xlo <= r.xhi AND r.ylo <= r.yhi),
      |i3 AS (
      |  SELECT * FROM (
      |    SELECT p.mode, p.target_id, p.lon_idx, p.lat_idx, p.lon, p.lat,
      |      g.xco2, g.xco2_uncertainty,
      |      ROW_NUMBER() OVER (
      |        PARTITION BY p.mode, p.lon_idx, p.lat_idx
      |        ORDER BY (p.lon - g.slon) * (p.lon - g.slon)
      |               + (p.lat - g.slat) * (p.lat - g.slat), g.sidx) AS rn
      |    FROM px3 p JOIN good g ON g.mode = p.mode)
      |  WHERE rn = 1),
      |m3 AS (
      |  SELECT DISTINCT p.mode, p.lon_idx, p.lat_idx
      |  FROM px3 p JOIN fp f ON f.mode = p.mode
      |    AND p.lon >= f.sxl AND p.lon < f.sxr
      |    AND p.lat >= f.syb AND p.lat < f.syt),
      |fww AS (
      |  SELECT * FROM (
      |    SELECT i.*, ROW_NUMBER() OVER (
      |        PARTITION BY i.lat_idx, i.lon_idx
      |        ORDER BY CASE i.mode WHEN 4 THEN 0 ELSE 1 END) AS frn
      |    FROM i3 i JOIN m3 m ON m.mode = i.mode
      |      AND m.lon_idx = i.lon_idx AND m.lat_idx = i.lat_idx)
      |  WHERE frn = 1),
      |out3 AS (
      |  SELECT 'oco3_global' AS mission, '2023-06-15 00:00:00' AS time,
      |    f.lat_idx, f.lon_idx, f.lat, f.lon,
      |    CAST(regexp_extract(f.target_id, '(\d+)$', 1) AS INT) AS target_num,
      |    CAST(CASE WHEN f.target_id LIKE 'fossil%' THEN 1 ELSE 4 END AS TINYINT) AS target_type,
      |    f.mode AS operation_mode,
      |    CAST(NULL AS VARCHAR) AS target_id,
      |    v.variable,
      |    CASE v.variable WHEN 'xco2' THEN f.xco2 ELSE f.xco2_uncertainty END AS value
      |  FROM fww f, (VALUES ('xco2'), ('xco2_uncertainty')) v(variable)),
      |-- ===== OCO-2 product (single mode-2 region, centroid association) =====
      |o2 AS (SELECT * FROM good WHERE mode = 2),
      |cent AS (
      |  SELECT AVG(slon) AS clon, AVG(slat) AS clat,
      |    MIN(slat) AS rminy, MAX(slat) AS rmaxy,
      |    MIN(slon) AS rminx, MAX(slon) AS rmaxx
      |  FROM o2),
      |cat AS (
      |  SELECT * FROM (VALUES
      |    ('fossil0001', CAST(10.0 AS DOUBLE), CAST(40.0 AS DOUBLE),
      |                   CAST(12.0 AS DOUBLE), CAST(42.0 AS DOUBLE)),
      |    ('volcano0002', CAST(-5.0 AS DOUBLE), CAST(-1.0 AS DOUBLE),
      |                    CAST(-3.0 AS DOUBLE), CAST(1.0 AS DOUBLE)))
      |    AS t(target_id, min_lon, min_lat, max_lon, max_lat)),
      |assoc AS (
      |  SELECT * FROM (
      |    SELECT c.*, ct.rminx, ct.rmaxx, ct.rminy, ct.rmaxy,
      |      ROW_NUMBER() OVER (ORDER BY
      |        (ct.clon - (c.min_lon + c.max_lon) / 2) * (ct.clon - (c.min_lon + c.max_lon) / 2)
      |        + (ct.clat - (c.min_lat + c.max_lat) / 2) * (ct.clat - (c.min_lat + c.max_lat) / 2),
      |        c.target_id) AS rn
      |    FROM cat c, cent ct)
      |  WHERE rn = 1
      |    AND rminx <= max_lon AND rmaxx >= min_lon
      |    AND rminy <= max_lat AND rmaxy >= min_lat),
      |px2 AS (
      |  SELECT a.target_id, xi.i AS lon_idx, yi.i AS lat_idx,
      |    a.min_lon + xi.i * ((a.max_lon - a.min_lon) / 7) AS lon,
      |    a.min_lat + yi.i * ((a.max_lat - a.min_lat) / 7) AS lat
      |  FROM assoc a, range(0, 8) xi(i), range(0, 8) yi(i)),
      |i2 AS (
      |  SELECT * FROM (
      |    SELECT p.target_id, p.lon_idx, p.lat_idx, p.lon, p.lat,
      |      g.xco2, g.xco2_uncertainty,
      |      ROW_NUMBER() OVER (
      |        PARTITION BY p.lon_idx, p.lat_idx
      |        ORDER BY (p.lon - g.slon) * (p.lon - g.slon)
      |               + (p.lat - g.slat) * (p.lat - g.slat), g.sidx) AS rn
      |    FROM px2 p JOIN o2 g ON 1 = 1)
      |  WHERE rn = 1),
      |m2 AS (
      |  SELECT DISTINCT p.lon_idx, p.lat_idx
      |  FROM px2 p JOIN fp f ON f.mode = 2
      |    AND p.lon >= f.sxl AND p.lon < f.sxr
      |    AND p.lat >= f.syb AND p.lat < f.syt),
      |out2 AS (
      |  SELECT 'oco2' AS mission, '2023-06-15 00:00:00' AS time,
      |    i.lat_idx, i.lon_idx, i.lat, i.lon,
      |    CAST(NULL AS INT) AS target_num,
      |    CAST(NULL AS TINYINT) AS target_type,
      |    CAST(NULL AS INT) AS operation_mode,
      |    i.target_id,
      |    v.variable,
      |    CASE v.variable WHEN 'xco2' THEN i.xco2 ELSE i.xco2_uncertainty END AS value
      |  FROM i2 i
      |    JOIN m2 m ON m.lon_idx = i.lon_idx AND m.lat_idx = i.lat_idx,
      |    (VALUES ('xco2'), ('xco2_uncertainty')) v(variable))
      |SELECT * FROM out3
      |UNION ALL
      |SELECT * FROM out2
      |ORDER BY mission, variable, lat_idx, lon_idx""".stripMargin

  val queries: Map[String, Q] =
    Map("q31_domain_pipeline" -> q31, "q32_global_merge" -> q32)
  val oracles: Map[String, String] =
    Map("q31_domain_pipeline" -> q31Sql, "q32_global_merge" -> q32Sql)
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.DenseExport
import graft.domain.Pipeline
import graft.queries.DomainQueries

class ExportSpec extends SparkSpec {

  private lazy val product =
    Pipeline.process(DomainQueries.demoGranule(spark), DomainQueries.demoCatalog(spark)).cache()

  test("pivot produces one row per pixel with variable columns") {
    val dense = DenseExport.pivotVariables(product, Seq("xco2", "xco2_uncertainty"))
    assert(dense.columns.contains("xco2") && dense.columns.contains("xco2_uncertainty"))
    assert(dense.count() === product.count() / 2) // 2 variables melted
    assert(dense.filter(col("xco2").isNull || col("xco2_uncertainty").isNull).count() === 0)
  }

  test("raster export partitions by (variable, day) with descending-latitude order") {
    val path = Files.createTempDirectory("raster").toString
    DenseExport.exportRasterLayout(product, path)
    val dirs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("variable="))
    assert(dirs.sorted === Array("variable=xco2", "variable=xco2_uncertainty"))
    // read one slice file directly: rows must be lat-descending (G6 flip)
    val slice = new java.io.File(path, "variable=xco2").listFiles()
      .filter(_.getName.startsWith("day=")).head.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val rows = spark.read.parquet(slice.getAbsolutePath)
      .select("lat_idx").collect().map(_.getInt(0))
    assert(rows.zip(rows.tail).forall { case (a, b) => a >= b })
  }
}

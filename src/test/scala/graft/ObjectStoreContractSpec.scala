package graft

import java.net.URI

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}
import org.apache.spark.sql.functions._

/** SURVEY S2: the store's commit discipline against an OBJECT-STORE
  * contract. Every store suite so far ran on the local FS, whose `rename`
  * is an atomic metadata move — exactly the primitive object stores lack
  * (s3a implements rename as server-side copy + delete: non-atomic,
  * O(bytes), visible mid-flight). [[ObjectStoreFileSystem]] re-implements
  * `rename` with the s3a semantics (recursive copy, then delete of the
  * source — never a filesystem-level move), so any codepath that silently
  * leaned on rename atomicity (output commit, dynamic partition overwrite,
  * queue ack/dead-letter moves, Zarr chunk overlay) breaks here instead of
  * in production. The suite proves: create/read round-trip, idempotent
  * re-append convergence, z-order compaction purity, Zarr store write/read,
  * and the file-queue disposition moves — all through `objstore://` paths.
  */
class ObjectStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "objstore"
  override def getUri: URI       = URI.create("objstore:///")

  /** s3a `rename`: copy-then-delete — non-atomic, no metadata move. */
  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    // destination parent must exist (mkdirs is a no-op marker on object
    // stores; RawLocal needs the dir for the copy to land)
    Option(dst.getParent).foreach(mkdirs(_))
    FileUtil.copy(this, src, this, dst, /*deleteSource=*/ true, /*overwrite=*/ true, getConf)
  }
}

/** FileContext-side registration of the same semantics (some write paths
  * go through Hadoop's AbstractFileSystem API). */
class ObjectStoreAbstractFs(uri: URI, conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new ObjectStoreFileSystem, conf, "objstore", false)

class ObjectStoreContractSpec extends SparkSpec {

  private def objPath(p: java.nio.file.Path): String = s"objstore://${p.toAbsolutePath}"

  // one-shot FS registration (SparkSpec has no BeforeAndAfterAll; every
  // test touches `fsReady` first)
  private lazy val fsReady: Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.objstore.impl", classOf[ObjectStoreFileSystem].getName)
    hc.set("fs.AbstractFileSystem.objstore.impl", classOf[ObjectStoreAbstractFs].getName)
    hc.set("fs.objstore.impl.disable.cache", "false")
  }

  private def product(xco2Base: Double, day: String) = {
    import spark.implicits._
    (0 until 64).map { i =>
      (f"fossil${i % 4}%04d", java.sql.Timestamp.valueOf(s"$day 10:30:00"),
        i / 8, i % 8, 40.0 + i / 8 * 0.1, 10.0 + (i % 8) * 0.1,
        "xco2", xco2Base + i)
    }.toDF("target_id", "time", "lat_idx", "lon_idx", "lat", "lon", "variable", "value")
  }

  test("rename on the objstore FS is copy+delete, not a move") {
    fsReady
    val dir = java.nio.file.Files.createTempDirectory("objfs")
    val fs  = new Path(objPath(dir)).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.isInstanceOf[ObjectStoreFileSystem])
    val src = new Path(objPath(dir), "a.txt")
    val out = fs.create(src); out.write("payload".getBytes("UTF-8")); out.close()
    val dst = new Path(objPath(dir), "sub/b.txt")
    assert(fs.rename(src, dst))
    assert(!fs.exists(src) && fs.exists(dst))
    val in = fs.open(dst)
    val buf = new Array[Byte](7); in.readFully(buf); in.close()
    assert(new String(buf, "UTF-8") === "payload")
    // renaming a missing source reports false (s3a contract), not an error
    assert(!fs.rename(new Path(objPath(dir), "missing"), dst))
  }

  test("product store: create, idempotent re-append, and compaction converge without atomic rename") {
    fsReady
    val store = objPath(java.nio.file.Files.createTempDirectory("objstore-ps")) + "/store"
    val day1  = product(400.0, "2023-06-15")
    val day2  = product(410.0, "2023-06-16")
    graft.sinks.ProductStore.appendIdempotent(day1, store)
    graft.sinks.ProductStore.appendIdempotent(day2, store)
    val n0 = graft.sinks.ProductStore.read(spark, store).count()
    assert(n0 === 128L)
    // re-delivery of day 1 (dynamic partition overwrite commit path)
    graft.sinks.ProductStore.appendIdempotent(day1, store)
    val after = graft.sinks.ProductStore.read(spark, store)
    assert(after.count() === n0)
    assert(graft.sinks.ProductStore.findDuplicates(spark, store).count() === 0L)
    // content signature before/after a z-order compaction (pure layout)
    def sig(): Set[String] =
      graft.sinks.ProductStore.read(spark, store).collect().map(_.toString).toSet
    val before = sig()
    val (fb, fa) = graft.sinks.ProductStore.compact(
      spark, store, Seq("2023-06-15", "2023-06-16"), targetRows = 1000L,
      zOrder = true, bloomFilterCols = Seq("target_id"))
    assert(fb >= fa && fa >= 1)
    assert(sig() === before)
  }

  test("zarr store: write + read round-trip through the objstore FS") {
    fsReady
    val store = objPath(java.nio.file.Files.createTempDirectory("objstore-zr")) + "/store.zarr"
    val prod = product(400.0, "2023-06-15")
      .filter(col("variable") === "xco2")
      .select(col("time"), col("lat_idx"), col("lon_idx"), col("variable"), col("value"))
    graft.sinks.ZarrStore.write(
      prod, store,
      graft.sinks.ZarrStore.GridSpec(8, 8, 40.0, 0.1, 10.0, 0.1),
      graft.sinks.ZarrStore.Chunking(t = 1, y = 4, x = 4))
    val back = graft.sinks.ZarrStore.read(spark, store, "xco2")
    assert(back.count() === 64L)
    assert(back.agg(sum(col("value"))).collect()(0).getDouble(0) ===
      prod.agg(sum(col("value"))).collect()(0).getDouble(0))
  }

  test("file queue: ack and dead-letter disposition moves survive copy+delete rename") {
    fsReady
    val dirL  = java.nio.file.Files.createTempDirectory("objstore-q")
    val queue = objPath(dirL) + "/queue"
    val fs    = new Path(queue).getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(queue))
    val gran = new Path(queue + "-granules/g1.nc")
    val o1 = fs.create(gran); o1.write("x".getBytes); o1.close()
    def msg(name: String, lines: Seq[String]): Unit = {
      val o = fs.create(new Path(new Path(queue), name))
      o.write(lines.mkString("\n").getBytes("UTF-8")); o.close()
    }
    msg("m-ok", Seq(gran.toString))
    msg("m-bad", Seq(queue + "-granules/missing.nc"))
    val seen = new scala.collection.mutable.HashSet[String]
    val q = spark.readStream.format("filequeue").option("path", queue).load()
      .writeStream
      .option("checkpointLocation", objPath(dirL) + "/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.select("message").collect().map(_.getString(0)) }
        ()
      }
      .start()
    q.awaitTermination()
    assert(seen.toSet === Set("m-ok"))
    assert(fs.exists(new Path(queue + "/.acked/m-ok")))
    assert(fs.exists(new Path(queue + "/.deadletter/m-bad")))
    assert(!fs.exists(new Path(queue + "/m-ok")) && !fs.exists(new Path(queue + "/m-bad")))
  }
}

package graft.sources.netcdf

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for classic NetCDF granules: `spark.read.format("netcdf3")`
  * (SURVEY S1 / §7.3, reference `readers/GranuleReader.py:87-155`).
  *
  * - One row per index of the row dimension (option `rowdim`; default: the
  *   dimension most variables lead with — the sounding dimension).
  * - 1-D variables → scalar columns; (row, k) numeric → array columns;
  *   (row, strlen) char → string columns. Group-qualified variable names
  *   ("Sounding/operation_mode") surface with '/' → '_'.
  * - `_FillValue` → null (the reference's fill→NaN normalization,
  *   `GranuleReader.py:150-152`), toggle with `fillasnull=false`.
  * - Projection pushdown is REAL I/O pruning: classic NetCDF stores each
  *   fixed-size variable contiguously, so only required variables' byte
  *   ranges are read (`SupportsPushDownRequiredColumns`).
  * - Scale: one input partition per `maxrowspersplit` rows (default 2^20)
  *   per file — a 1000-executor cluster fans out across files AND within
  *   large files; nothing is ever read on the driver but headers.
  * - Synthesized columns: `granule_path` (file), `row_index` (position in
  *   the row dimension — the explicit physical order the sessionizer keys
  *   on when the file carries no index variable).
  */
class NetCDF3DataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "netcdf3"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf  = SparkSession.active.sessionState.newHadoopConf()
    val paths = NetCDF3Util.resolvePaths(NetCDF3Util.requestedPaths(options), conf)
    require(paths.nonEmpty, "netcdf3: no input files found")
    val header = NetCDF3Util.readHeader(paths.head, conf)
    NetCDF3Util.schemaOf(header, NetCDF3Util.rowDim(header, options)).schema
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new NetCDF3Table(schema, options)
  }
}

class NetCDF3Table(tableSchema: StructType, options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "netcdf3"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] = Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new NetCDF3ScanBuilder(tableSchema, options)
}

class NetCDF3ScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = fullSchema
  private var accepted: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
    accepted = filters.filter(RowRangePushdown.bound(_).isDefined)
    // the range prune is exact for the accepted shapes, but every filter is
    // returned as residual: Spark's post-scan evaluation stays as a safety
    // net for negligible cost (the pruned scan emits few rows)
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = accepted
  override def build(): Scan = new NetCDF3Scan(required, options, RowRangePushdown.range(accepted))
}

final case class NetCDF3Partition(path: String, start: Long, end: Long) extends InputPartition

/** P10 record-dim pushdown, shared by both granule sources: filters on the
  * synthesized `row_index` coordinate (the record-dimension subscript, i.e.
  * the reference's time-slice subset shape, `tools/climatology/main.py:220`)
  * translate to a per-file row range that partition planning intersects
  * away — unneeded chunks are never planned, so they are never read. */
object RowRangePushdown {
  import org.apache.spark.sql.sources._

  private def num(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue)
    case _                   => None
  }

  /** The `[lo, hi)` row range a filter implies, when it is a shape the
    * sources apply exactly; None marks unsupported filters. */
  def bound(f: Filter): Option[(Long, Long)] = f match {
    case GreaterThan("row_index", v)        => num(v).map(a => (a + 1, Long.MaxValue))
    case GreaterThanOrEqual("row_index", v) => num(v).map(a => (a, Long.MaxValue))
    case LessThan("row_index", v)           => num(v).map(a => (0L, a))
    case LessThanOrEqual("row_index", v)    => num(v).map(a => (0L, a + 1))
    case EqualTo("row_index", v)            => num(v).map(a => (a, a + 1))
    case And(l, r) =>
      for { (ll, lh) <- bound(l); (rl, rh) <- bound(r) }
        yield (math.max(ll, rl), math.min(lh, rh))
    case _ => None
  }

  /** Conjunction of all accepted bounds. */
  def range(accepted: Array[Filter]): (Long, Long) =
    accepted.flatMap(bound).foldLeft((0L, Long.MaxValue)) {
      case ((lo, hi), (l, h)) => (math.max(lo, l), math.min(hi, h))
    }

  def describe(range: (Long, Long)): String =
    if (range == (0L, Long.MaxValue)) ""
    else s" rows=[${range._1},${if (range._2 == Long.MaxValue) "*" else range._2})"
}

class NetCDF3Scan(
    required: StructType,
    options: CaseInsensitiveStringMap,
    rowRange: (Long, Long) = (0L, Long.MaxValue)) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"netcdf3 cols=[${required.fieldNames.mkString(",")}]${RowRangePushdown.describe(rowRange)}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf     = SparkSession.active.sessionState.newHadoopConf()
    val paths    = NetCDF3Util.resolvePaths(NetCDF3Util.requestedPaths(options), conf)
    val maxRows  = Option(options.get("maxrowspersplit")).map(_.toLong).getOrElse(1L << 20)
    val maxBytes = Option(options.get("maxbytespersplit")).map(_.toLong).getOrElse(256L << 20)
    // header reads parallelize across a bounded pool: a 10k-granule
    // manifest must not serialize 10k driver round-trips
    NetCDF3Util.parMap(paths) { p =>
      val header = NetCDF3Util.readHeader(p, conf)
      val rowDim = NetCDF3Util.rowDimId(header, NetCDF3Util.rowDim(header, options))
      val n      = header.dims(rowDim).length
      // byte-bound the split via the widest row-dimensioned variable, so
      // wide 2-D rows (a global-mesh plane) can't overflow a read buffer
      val widest = header.vars
        .filter(_.dimIds.headOption.contains(rowDim))
        .map(v => math.max(header.shape(v).drop(1).product, 1L) * NetCDF3.typeSize(v.ncType))
        .maxOption.getOrElse(1L)
      val rows = math.max(1L, math.min(maxRows, maxBytes / widest))
      val lo = math.max(0L, rowRange._1)
      val hi = math.min(n, rowRange._2)
      (lo until hi by rows).map(s => NetCDF3Partition(p, s, math.min(s + rows, hi)): InputPartition)
    }.flatten.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf())
    val rowDimOpt   = Option(options.get("rowdim"))
    val fillAsNull  = Option(options.get("fillasnull")).forall(_.toBoolean)
    new NetCDF3ReaderFactory(required, rowDimOpt, fillAsNull, conf)
  }
}

class NetCDF3ReaderFactory(
    required: StructType,
    rowDimOpt: Option[String],
    fillAsNull: Boolean,
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[NetCDF3Partition]
    new NetCDF3PartitionReader(p, required, rowDimOpt, fillAsNull, conf.value)
  }
}

/** Reads the partition's row range of each required variable in one
  * positioned read, then iterates rows. Per-partition memory is
  * O(requiredVars × rowsPerSplit). */
class NetCDF3PartitionReader(
    part: NetCDF3Partition,
    required: StructType,
    rowDimOpt: Option[String],
    fillAsNull: Boolean,
    conf: Configuration) extends PartitionReader[InternalRow] {

  import NetCDF3._

  private val path   = new Path(part.path)
  private val fs     = path.getFileSystem(conf)
  private val in     = fs.open(path)
  private val header = NetCDF3.readHeader(in)
  private val rowDim = NetCDF3Util.rowDimId(header, rowDimOpt.getOrElse(NetCDF3Util.autoRowDim(header)))
  private val nRows  = (part.end - part.start).toInt

  /** column index → row-major decoded values (null = synthesized column). */
  private val colData: Array[AnyRef] = required.fields.map { f =>
    f.name match {
      case "granule_path" | "row_index" => null
      case colName =>
        val v = NetCDF3Util.varForColumn(header, colName)
          .getOrElse(throw new IllegalArgumentException(s"netcdf3: no variable for column $colName in ${part.path}"))
        readRange(v)
    }
  }
  private val pathUtf = UTF8String.fromString(part.path)

  /** elements per row for each required array column (0 for scalar/synth). */
  private val colPerRow: Array[Int] = required.fields.map { f =>
    f.dataType match {
      case _: ArrayType =>
        NetCDF3Util.varForColumn(header, f.name).map(v => header.shape(v).drop(1).product.toInt).getOrElse(0)
      case _ => 0
    }
  }

  /** Positioned read of this partition's row slice of one variable. */
  private def readRange(v: Var): AnyRef = {
    val shape    = header.shape(v)
    val perRow   = if (shape.length <= 1) 1L else shape.drop(1).product
    val sz       = typeSize(v.ncType)
    val offset   = v.begin + part.start * perRow * sz
    val numBytesL = nRows.toLong * perRow * sz
    require(
      numBytesL <= Int.MaxValue - 8,
      s"netcdf3: row range of ${v.name} is $numBytesL bytes — over the JVM array " +
        "limit; read through narrower splits (maxbytespersplit/maxrowspersplit)")
    val numBytes = numBytesL.toInt
    val buf      = new Array[Byte](numBytes)
    in.readFully(offset, buf, 0, numBytes)
    val bb   = java.nio.ByteBuffer.wrap(buf)
    val n    = (nRows * perRow).toInt
    val fill = if (fillAsNull) fillValue(v) else None
    // Fill semantics follow the reference: a declared `_FillValue` marks
    // missing data, and NaN always counts as missing for floating types
    // (`GranuleReader.py:150-152`). Missing -> null.
    v.ncType match {
      case NC_CHAR =>
        val strLen = shape.last.toInt
        Array.tabulate[AnyRef](nRows) { i =>
          val raw = new String(buf, i * strLen, strLen, "UTF-8")
          // trailing NULs/spaces are padding in char-matrix string encoding
          UTF8String.fromString(raw.replaceAll("[\\x00 ]+$", ""))
        }
      case NC_DOUBLE =>
        Array.tabulate[AnyRef](n) { i =>
          val d = bb.getDouble(i * 8)
          if (d.isNaN || fill.exists(_ == d)) null else Double.box(d)
        }
      case NC_FLOAT =>
        Array.tabulate[AnyRef](n) { i =>
          val d = bb.getFloat(i * 4)
          if (d.isNaN || fill.exists(_.toFloat == d)) null else Float.box(d)
        }
      case NC_INT =>
        Array.tabulate[AnyRef](n) { i =>
          val d = bb.getInt(i * 4)
          if (fill.exists(_.toInt == d)) null else Int.box(d)
        }
      case NC_INT64 =>
        Array.tabulate[AnyRef](n) { i =>
          val d = bb.getLong(i * 8)
          if (fill.exists(_.toLong == d)) null else Long.box(d)
        }
      case NC_SHORT =>
        Array.tabulate[AnyRef](n) { i =>
          val d = bb.getShort(i * 2)
          if (fill.exists(_.toShort == d)) null else Short.box(d)
        }
      case NC_BYTE =>
        Array.tabulate[AnyRef](n) { i =>
          val d = buf(i)
          if (fill.exists(_.toByte == d)) null else Byte.box(d)
        }
    }
  }

  private var row = -1

  override def next(): Boolean = { row += 1; row < nRows }

  override def get(): InternalRow = {
    val values = new Array[Any](required.length)
    var c      = 0
    while (c < required.length) {
      val f = required.fields(c)
      values(c) = f.name match {
        case "granule_path" => pathUtf
        case "row_index"    => part.start + row
        case _ =>
          val data = colData(c).asInstanceOf[Array[AnyRef]]
          f.dataType match {
            case _: ArrayType =>
              val perRow = colPerRow(c)
              new GenericArrayData(
                java.util.Arrays.copyOfRange(data, row * perRow, (row + 1) * perRow).asInstanceOf[Array[Any]])
            case _ => data(row)
          }
      }
      c += 1
    }
    new GenericInternalRow(values)
  }

  override def close(): Unit = in.close()
}

/** Shared path/schema helpers for the netcdf3 source. */
object NetCDF3Util {
  import NetCDF3._

  /** Order-preserving parallel map over paths with a bounded thread pool —
    * driver-side metadata reads (file headers) for large manifests. */
  def parMap[A, B](items: Seq[A], threads: Int = 16)(f: A => B): Seq[B] = {
    if (items.lengthCompare(2) < 0) return items.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(threads, items.length))
    try {
      import scala.jdk.CollectionConverters._
      val tasks: Seq[java.util.concurrent.Callable[B]] =
        items.map(a => (() => f(a)): java.util.concurrent.Callable[B])
      pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
    } finally pool.shutdown()
  }

  final case class Mapping(schema: StructType)

  def requestedPaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map(parseJsonStringArray).getOrElse(Nil)
    val single = Option(options.get("path")).toSeq
    (multi ++ single).distinct
  }

  /** DataFrameReader.load(paths*) passes a JSON-encoded string array. */
  private def parseJsonStringArray(s: String): Seq[String] = {
    val t = s.trim
    if (!t.startsWith("[")) Seq(t)
    else t.stripPrefix("[").stripSuffix("]").split(",").toSeq
      .map(_.trim.stripPrefix("\"").stripSuffix("\"").replace("\\\"", "\"").replace("\\\\", "\\"))
      .filter(_.nonEmpty)
  }

  def resolvePaths(patterns: Seq[String], conf: Configuration): Seq[String] =
    patterns.flatMap { pat =>
      val p  = new Path(pat)
      val fs = p.getFileSystem(conf)
      val matched: Seq[FileStatus] = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq
            .filter(c => c.isFile && !c.getPath.getName.startsWith("_") && !c.getPath.getName.startsWith("."))
        else Seq(st)
      }.map(_.getPath.toString)
    }.distinct.sorted

  def readHeader(path: String, conf: Configuration): Header = {
    val p  = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try NetCDF3.readHeader(in) finally in.close()
  }

  /** The row dimension: explicit option, else the dimension most variables
    * lead with. */
  def rowDim(header: Header, options: CaseInsensitiveStringMap): String =
    Option(options.get("rowdim")).getOrElse(autoRowDim(header))

  def autoRowDim(header: Header): String = {
    val counts = header.vars
      .filter(_.dimIds.nonEmpty)
      .groupBy(_.dimIds.head)
      .view.mapValues(_.size).toMap
    require(counts.nonEmpty, "netcdf3: no dimensioned variables")
    header.dims(counts.maxBy { case (id, n) => (n, -id) }._1).name
  }

  def rowDimId(header: Header, name: String): Int = {
    val i = header.dims.indexWhere(_.name == name)
    require(i >= 0, s"netcdf3: row dimension $name not found")
    i
  }

  def columnName(varName: String): String = varName.replace('/', '_')

  def varForColumn(header: Header, colName: String): Option[Var] =
    header.vars.find(v => columnName(v.name) == colName)

  def sparkType(v: Var, header: Header): Option[DataType] = {
    val shape = header.shape(v)
    v.ncType match {
      case NC_CHAR if shape.length == 2 => Some(StringType)
      case NC_CHAR                      => None
      case t =>
        val base: DataType = t match {
          case NC_BYTE   => ByteType
          case NC_SHORT  => ShortType
          case NC_INT    => IntegerType
          case NC_INT64  => LongType
          case NC_FLOAT  => FloatType
          case NC_DOUBLE => DoubleType
        }
        shape.length match {
          case 1 => Some(base)
          case 2 => Some(ArrayType(base, containsNull = true))
          case _ => None // >2-D per-row tensors: out of scope
        }
    }
  }

  /** Variable attributes as column metadata (units, long_name, fill …) —
    * the reference carries attrs with every variable (SURVEY §1.3); here
    * they ride the StructField so `df.schema("xco2").metadata` answers. */
  private def fieldMetadata(atts: Seq[Att]): Metadata = {
    val b = new MetadataBuilder()
    atts.foreach { a =>
      a.value match {
        case s: String          => b.putString(a.name, s)
        case arr: Array[Double] if arr.length == 1 => b.putDouble(a.name, arr(0))
        case arr: Array[Float]  if arr.length == 1 => b.putDouble(a.name, arr(0).toDouble)
        case arr: Array[Int]    if arr.length == 1 => b.putLong(a.name, arr(0).toLong)
        case arr: Array[Long]   if arr.length == 1 => b.putLong(a.name, arr(0))
        case arr: Array[Short]  if arr.length == 1 => b.putLong(a.name, arr(0).toLong)
        case _                  => () // multi-element numeric attrs: rare, skipped
      }
    }
    b.build()
  }

  /** Schema: one column per row-dimension variable (in file order) +
    * synthesized granule_path and row_index. */
  def schemaOf(header: Header, rowDimName: String): Mapping = {
    val rid = rowDimId(header, rowDimName)
    val fields = header.vars.flatMap { v =>
      if (v.dimIds.headOption.contains(rid))
        sparkType(v, header).map(t =>
          StructField(columnName(v.name), t, nullable = true, metadata = fieldMetadata(v.atts)))
      else None
    }
    Mapping(StructType(
      fields :+
        StructField("granule_path", StringType, nullable = false) :+
        StructField("row_index", LongType, nullable = false)))
  }
}

/** Hadoop Configuration is not Serializable; ship it to executors by
  * writing its key-value state. */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

package graft.sources.ppdb

import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.SupportsPushDownFilters
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** First-class `spark.read.format("ppdb")` — a DataSourceV2 reader for the
  * reference's native release format (NAACL-2013 ` ||| `-delimited gzipped
  * text), registered via META-INF/services so the short name resolves.
  *
  * Why a custom source when `spark.read.text` + `split` already parses it
  * (graft.ppdb.Ppdb.parse)? Two engine capabilities only the DSv2 seam can
  * express:
  *
  *  - **Column pruning INSIDE the parser** (SupportsPushDownRequiredColumns):
  *    `SELECT phrase` over a release never tokenizes features or alignment —
  *    the reader materializes exactly the pruned schema, where the
  *    projection form must split every line fully before Catalyst discards
  *    columns. At 100 TB of release text the features map is ~80% of the
  *    parse work.
  *  - **Declared partitioning**: gzip is non-splittable, so the scan plans
  *    exactly ONE InputPartition PER FILE — the parallelism contract the
  *    glob-scan form gets implicitly becomes explicit and testable.
  *
  * File listing and opening go through Hadoop's FileSystem API (round 12),
  * so `format("ppdb")` speaks globs and object-store URIs exactly like the
  * projection-form parse: `load("s3a://bucket/release-*.gz")` plans one
  * partition per matched member; a nonexistent or empty path fails AT
  * PLANNING TIME with the offending path in the message instead of a
  * later executor-side FileNotFoundException.
  * Malformed lines (< 6 fields) null-fill their missing columns
  * (PERMISSIVE, matching the projection form's getItem semantics).
  */
class PpdbDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "ppdb"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PpdbDataSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new PpdbTable(properties.get("path"))
}

object PpdbDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("lhs", StringType),
    StructField("phrase", StringType),
    StructField("paraphrase", StringType),
    StructField("features", MapType(StringType, DoubleType)),
    StructField("alignment", ArrayType(StructType(Seq(
      StructField("src", IntegerType), StructField("tgt", IntegerType))))),
    StructField("entailment", StringType),
    StructField("ppdb2score", DoubleType)))

  /** One partition per file: .gz members are non-splittable, and PPDB ships
    * multi-file packs — parallelism = file count by design.
    *
    * Hadoop FileSystem listing (round 12, replacing java.io): `globStatus`
    * resolves wildcards AND plain paths against whatever scheme the URI
    * names (file:, hdfs:, s3a:, …), a directory expands to its visible
    * files, and a path that exists nowhere fails HERE — at planning time,
    * with the path in the message — rather than as an executor-side
    * FileNotFoundException three stages later.
    */
  private[ppdb] def listFiles(path: String, conf: Configuration): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    if (matched.isEmpty)
      throw new IllegalArgumentException(
        s"ppdb source: path does not exist or matches no files: $path")
    def visible(name: String): Boolean =
      !name.startsWith(".") && !name.startsWith("_")
    val files = matched.flatMap { st =>
      if (st.isDirectory)
        Option(fs.listStatus(st.getPath)).map(_.toSeq).getOrElse(Seq.empty)
          .filter(c => c.isFile && visible(c.getPath.getName))
          .map(_.getPath.toString)
      else if (visible(st.getPath.getName)) Seq(st.getPath.toString)
      else Seq.empty
    }.sorted
    if (files.isEmpty)
      throw new IllegalArgumentException(
        s"ppdb source: path matches no readable data files: $path")
    files
  }

  /** One-pass ` ||| ` splitter (no regex): the custom-parser path the
    * SURVEY reserved for the native seam.
    */
  private[ppdb] def splitFields(line: String): Array[String] = {
    val out = new ArrayBuffer[String](6)
    var start = 0
    var i = line.indexOf(" ||| ")
    while (i >= 0) {
      out += line.substring(start, i)
      start = i + 5
      i = line.indexOf(" ||| ", start)
    }
    out += line.substring(start)
    out.toArray
  }
}

class PpdbTable(path: String) extends Table with SupportsRead {
  require(path != null, "ppdb source requires a path")
  override def name(): String = s"ppdb:$path"
  override def schema(): StructType = PpdbDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PpdbScanBuilder(path)
}

class PpdbScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {
  private var required: StructType = PpdbDataSource.Schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** String equality on the four raw text fields evaluates EXACTLY at the
    * line level (one substring compare, before any column materializes), so
    * supported filters return no residual — `SELECT … WHERE phrase = 'x'`
    * over a release never tokenizes features for non-matching rules.
    *
    * Score-threshold comparisons on `ppdb2score` (round 12) push the same
    * way: the reader scans field 4 for the single `PPDB2.0Score=` token
    * (one indexOf + one Double.parseDouble) and drops sub-threshold lines
    * BEFORE tokenizing the full feature map — the defining scan of the
    * S→XXXL release ladder (every smaller pack is a score-pruned prefix)
    * pays one token parse per skipped rule instead of the whole parse.
    * A rule with no score token fails every comparison, exactly matching
    * SQL's null-comparison semantics, so no residual filter is needed.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, rest) = filters.partition {
      case EqualTo(a, _: String) => PpdbScanBuilder.Pushable.contains(a)
      case GreaterThan("ppdb2score", v) => PpdbScanBuilder.isNumeric(v)
      case GreaterThanOrEqual("ppdb2score", v) => PpdbScanBuilder.isNumeric(v)
      case LessThan("ppdb2score", v) => PpdbScanBuilder.isNumeric(v)
      case LessThanOrEqual("ppdb2score", v) => PpdbScanBuilder.isNumeric(v)
      case _ => false
    }
    pushed = sup
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new PpdbScan(path, required, pushed)
}

object PpdbScanBuilder {
  private[ppdb] val Pushable: Map[String, Int] =
    Map("lhs" -> 0, "phrase" -> 1, "paraphrase" -> 2, "entailment" -> 5)
  private[ppdb] def isNumeric(v: Any): Boolean = v match {
    case _: java.lang.Double | _: java.lang.Float | _: java.lang.Long |
         _: java.lang.Integer => true
    case _ => false
  }
  private[ppdb] def asDouble(v: Any): Double = v match {
    case d: java.lang.Double => d
    case f: java.lang.Float => f.toDouble
    case l: java.lang.Long => l.toDouble
    case i: java.lang.Integer => i.toDouble
  }
}

class PpdbScan(path: String, required: StructType, pushed: Array[Filter])
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PpdbScan(path=$path, pushed=[${pushed.mkString(", ")}])"
  // planning runs on the driver, inside an active session — the session's
  // Hadoop conf carries the credentials/scheme config object stores need,
  // and ships to executors via SerializableConfiguration (the same vehicle
  // Spark's own file sources use)
  private val hadoopConf = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())
  override def planInputPartitions(): Array[InputPartition] =
    PpdbDataSource.listFiles(path, hadoopConf.value)
      .map(PpdbInputPartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PpdbReaderFactory(required, pushed, hadoopConf)
  private[graft] def pushedForTest: Array[Filter] = pushed
}

case class PpdbInputPartition(file: String) extends InputPartition

class PpdbReaderFactory(
    required: StructType, pushed: Array[Filter], conf: SerializableConfiguration)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PpdbPartitionReader(
      partition.asInstanceOf[PpdbInputPartition].file, required, pushed, conf)
}

/** Streams one release file; materializes ONLY the pruned columns — a
  * `SELECT phrase` never tokenizes features or alignment.
  */
class PpdbPartitionReader(
    file: String, required: StructType, pushed: Array[Filter] = Array.empty,
    conf: SerializableConfiguration = new SerializableConfiguration(new Configuration()))
  extends PartitionReader[InternalRow] {

  private val in = {
    val p = new Path(file)
    val raw = p.getFileSystem(conf.value).open(p)
    val stream: java.io.InputStream =
      if (file.endsWith(".gz")) new GZIPInputStream(raw) else raw
    new java.io.BufferedReader(new java.io.InputStreamReader(stream, "UTF-8"))
  }
  private var fields: Array[String] = _

  // resolve required ordinals + pushed-filter ordinals once per partition
  private val fieldNames = required.fields.map(_.name)
  private val needsFeatures =
    fieldNames.contains("features") || fieldNames.contains("ppdb2score")
  private val lineFilters: Array[(Int, String)] = pushed.collect {
    case EqualTo(a, v: String) => PpdbScanBuilder.Pushable(a) -> v
  }
  // score-threshold predicates compile to (Double => Boolean); a null score
  // (no PPDB2.0Score token) fails them all, like NULL <op> x in SQL
  private val scoreFilters: Array[Double => Boolean] = pushed.collect {
    case GreaterThan("ppdb2score", v) =>
      val t = PpdbScanBuilder.asDouble(v); (s: Double) => s > t
    case GreaterThanOrEqual("ppdb2score", v) =>
      val t = PpdbScanBuilder.asDouble(v); (s: Double) => s >= t
    case LessThan("ppdb2score", v) =>
      val t = PpdbScanBuilder.asDouble(v); (s: Double) => s < t
    case LessThanOrEqual("ppdb2score", v) =>
      val t = PpdbScanBuilder.asDouble(v); (s: Double) => s <= t
  }

  /** Parse JUST the ranking score out of the raw features field: locate the
    * `PPDB2.0Score=` token at a token boundary, parse to the next space.
    * One indexOf + one parseDouble — the full feature tokenization
    * (split + per-token Double.valueOf + UTF8String) never runs for lines
    * a pushed threshold rejects.
    */
  private def scanScore(feat: String): Double = {
    val key = "PPDB2.0Score="
    var i = feat.indexOf(key)
    while (i > 0 && feat.charAt(i - 1) != ' ')
      i = feat.indexOf(key, i + 1) // substring of a longer key — keep looking
    if (i < 0) return Double.NaN
    val start = i + key.length
    var end = feat.indexOf(' ', start)
    if (end < 0) end = feat.length
    try feat.substring(start, end).toDouble
    catch { case _: NumberFormatException => Double.NaN }
  }

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      val f = PpdbDataSource.splitFields(line)
      // pushed equality evaluates here, BEFORE any column materializes —
      // a filtered scan splits each line but tokenizes nothing else
      var pass = lineFilters.forall { case (i, v) => i < f.length && f(i) == v }
      if (pass && scoreFilters.nonEmpty) {
        val s = if (f.length > 3 && f(3) != null) scanScore(f(3)) else Double.NaN
        // NaN (absent/unparseable score) fails every comparison — SQL null
        pass = !s.isNaN && scoreFilters.forall(_(s))
      }
      if (pass) { fields = f; return true }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = {
    val f = fields
    def field(i: Int): String = if (i < f.length) f(i) else null

    // features tokenize once, shared by the map column and the score
    var featKeys: Array[UTF8String] = null
    var featVals: Array[Any] = null
    var score: Any = null
    if (needsFeatures && field(3) != null) {
      val toks = field(3).split(' ')
      val ks = new ArrayBuffer[UTF8String](toks.length)
      val vs = new ArrayBuffer[Any](toks.length)
      var i = 0
      while (i < toks.length) {
        val eq = toks(i).indexOf('=')
        if (eq > 0) {
          val k = toks(i).substring(0, eq)
          val v =
            try java.lang.Double.valueOf(toks(i).substring(eq + 1))
            catch { case _: NumberFormatException => null }
          ks += UTF8String.fromString(k)
          vs += v
          if (k == "PPDB2.0Score") score = v
        }
        i += 1
      }
      featKeys = ks.toArray
      featVals = vs.toArray
    }

    val values: Array[Any] = fieldNames.map {
      case "lhs" => UTF8String.fromString(field(0))
      case "phrase" => UTF8String.fromString(field(1))
      case "paraphrase" => UTF8String.fromString(field(2))
      case "features" =>
        if (featKeys == null) null
        else new ArrayBasedMapData(
          new GenericArrayData(featKeys.asInstanceOf[Array[Any]]),
          new GenericArrayData(featVals))
      case "alignment" =>
        if (field(4) == null) null
        else {
          val pairs = field(4).split(' ').flatMap { p =>
            val dash = p.indexOf('-')
            if (dash <= 0) None
            else
              try Some(new GenericInternalRow(Array[Any](
                p.substring(0, dash).toInt, p.substring(dash + 1).toInt)))
              catch { case _: NumberFormatException => None }
          }
          new GenericArrayData(pairs.asInstanceOf[Array[Any]])
        }
      case "entailment" => UTF8String.fromString(field(5))
      case "ppdb2score" => score
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new GenericInternalRow(values)
  }

  override def close(): Unit = in.close()
}

package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.SparkSession
import graft.chado.GffRecord
import graft.sources.Gff3

/** DataSourceV2 for GFF3 (SURVEY.md S1's "custom `DataSourceV2`"
  * option made real):
  *
  * {{{
  *   spark.read.format("graft.sources.v2.Gff3DataSource").load(path)
  * }}}
  *
  * Files are split into byte ranges of `maxSplitBytes` (default 128 MiB)
  * with line-boundary adjustment — a reader whose range starts mid-line
  * skips the partial line (the previous range's reader finishes it), the
  * standard splittable-text contract. That makes one 100 GB GFF3 file
  * parallelize across ~800 tasks instead of one.
  *
  * `##FASTA` tails are excluded the same way as [[graft.sources.Gff3]]:
  * a range that starts inside the tail sees only sequence lines, which
  * fail the 9-tab-column test.
  */
class Gff3DataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Gff3DataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new Gff3Table(properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = false
}

object Gff3DataSource {
  val encoder: ExpressionEncoder[GffRecord] = ExpressionEncoder[GffRecord]()
  val schema: StructType = encoder.schema
}

class Gff3Table(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"gff3(${properties.getOrElse("paths", properties.getOrElse("path", "?"))})"
  override def schema(): StructType = Gff3DataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Gff3ScanBuilder(options)
}

/** Supports two scan optimizations:
  *  - filter pushdown for `ftype`/`seqId` equality and IN — evaluated on
  *    the raw tab fields BEFORE the expensive attribute-map parse;
  *  - column pruning — when `attributes` is not required, the reader
  *    skips attribute parsing entirely (the dominant per-line cost).
  */
class Gff3ScanBuilder(options: CaseInsensitiveStringMap) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources._

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = Gff3DataSource.schema

  private def pushable(f: Filter): Boolean = f match {
    case EqualTo(a, _) => a == "ftype" || a == "seqId"
    case In(a, _) => a == "ftype" || a == "seqId"
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(pushable)
    filters // all filters re-evaluated by Spark (ours are an early-out)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Gff3Scan(options, pushed, required)
}

case class Gff3Split(path: String, start: Long, end: Long) extends InputPartition

/** Serializable form of the pushed filters (Filter itself is
  * serializable; keep only the two shapes we accept). */
case class Gff3Pushdown(ftypeIn: Option[Set[String]], seqIdIn: Option[Set[String]])

class Gff3Scan(options: CaseInsensitiveStringMap,
               pushedFilters: Array[org.apache.spark.sql.sources.Filter],
               required: StructType) extends Scan with Batch {
  import org.apache.spark.sql.sources._

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def pushdown: Gff3Pushdown = {
    def setFor(attr: String): Option[Set[String]] = {
      val sets = pushedFilters.collect {
        case EqualTo(a, v: String) if a == attr => Set(v)
        case In(a, vs) if a == attr => vs.collect { case s: String => s }.toSet
      }
      if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
    }
    Gff3Pushdown(setFor("ftype"), setFor("seqId"))
  }

  private def paths: Seq[String] = {
    // spark.read.load(path) passes paths as a JSON array under "paths",
    // single-path loads under "path". Real JSON parsing (Jackson ships
    // with Spark): a path containing a comma, quote, or escape must not
    // be split into garbage fragments.
    val multi = Option(options.get("paths")).map { json =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(json, classOf[Array[String]]).toSeq
    }
    multi.getOrElse(Option(options.get("path")).toSeq)
  }

  // metadata/temporary names every built-in file index skips
  private def isHidden(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  override def planInputPartitions(): Array[InputPartition] = {
    val maxSplit = Option(options.get("maxSplitBytes")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      // glob support like every built-in source (dir/*.gff3); a non-glob
      // existing path comes back as its own 1-element match, a missing
      // path falls through to getFileStatus for the standard error
      val matched = Option(fs.globStatus(hp)).map(_.toSeq)
        .filter(_.nonEmpty)
        .getOrElse(Seq(fs.getFileStatus(hp)))
      val files = matched.flatMap { st =>
        if (st.isDirectory)
          // skip _SUCCESS/.crc/in-flight temporaries inside directories;
          // explicitly-named files are always honored
          fs.listStatus(st.getPath).toSeq
            .filter(s => s.isFile && !isHidden(s.getPath.getName))
        else Seq(st)
      }
      files.flatMap { st => // statuses already carry lengths: no re-fetch
        val len = st.getLen
        (0L until math.max(len, 1L) by maxSplit).map { start =>
          Gff3Split(st.getPath.toString, start, math.min(start + maxSplit, len))
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new Gff3ReaderFactory(
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration),
      pushdown, required)
}

class Gff3ReaderFactory(conf: org.apache.spark.util.SerializableConfiguration,
                        pushdown: Gff3Pushdown, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new Gff3PartitionReader(partition.asInstanceOf[Gff3Split], conf.value,
      pushdown, required)
}

/** A split owns exactly the lines whose start byte falls in
  * [start, end). Like Hadoop's LineRecordReader, a non-zero start seeks
  * to start-1 and discards one line — that consumes the line containing
  * byte start-1 whether or not start lands exactly on a line boundary,
  * so every line has exactly one owner. Assumes `\n` line endings. */
class Gff3PartitionReader(split: Gff3Split, conf: org.apache.hadoop.conf.Configuration,
                          pushdown: Gff3Pushdown, required: StructType)
    extends PartitionReader[InternalRow] {

  /** UTF-8 byte length of `line` + 1 for its `\n`, computed
    * arithmetically — no throwaway byte[] per line on the scan path,
    * and exact for any well-formed text (surrogate pairs = 4 bytes). */
  private def lineBytes(line: String): Long = {
    var n = 0L
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c < 0x80) { n += 1; i += 1 }
      else if (c < 0x800) { n += 2; i += 1 }
      else if (Character.isHighSurrogate(c) && i + 1 < line.length &&
        Character.isLowSurrogate(line.charAt(i + 1))) { n += 4; i += 2 }
      else { n += 3; i += 1 }
    }
    n + 1L
  }

  private val serializer = Gff3DataSource.encoder.createSerializer()
  private val needsAttributes = required.fieldNames.contains("attributes")
  // project the full encoded row down to the pruned schema by position
  private val pruneProjection = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
    .create(required.fieldNames.toIndexedSeq.map { n =>
      val i = Gff3DataSource.schema.fieldIndex(n)
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        i, Gff3DataSource.schema(i).dataType, nullable = true)
    })
  private val fs = new Path(split.path).getFileSystem(conf)
  private val in = fs.open(new Path(split.path))
  private var pos: Long = 0L
  private val reader = {
    val seekTo = math.max(split.start - 1, 0L)
    in.seek(seekTo)
    pos = seekTo
    if (split.start > 0) {
      // skip the boundary line AT THE BYTE LEVEL: the seek can land in
      // the middle of a multi-byte character, and a decoder started
      // there would substitute replacement chars whose re-encoded size
      // differs from the file bytes — drifting `pos` and silently
      // dropping or duplicating a boundary line. Raw bytes can't drift,
      // and afterwards the stream sits on a clean line start.
      var b = in.read()
      while (b != -1 && b != '\n') { pos += 1; b = in.read() }
      if (b == '\n') pos += 1
    }
    new java.io.BufferedReader(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
  }
  private var current: GffRecord = _

  override def next(): Boolean = {
    current = null
    while (current == null) {
      if (pos >= split.end) return false // next line starts past our range
      val line = reader.readLine()
      if (line == null) return false
      pos += lineBytes(line)
      if (!line.startsWith("#") && line.count(_ == '\t') >= 8) {
        // pushed filters: cheap raw-field early-out before the parse
        val keep = (pushdown.ftypeIn, pushdown.seqIdIn) match {
          case (None, None) => true
          case (ft, sq) =>
            val t1 = line.indexOf('\t')
            val t2 = line.indexOf('\t', t1 + 1)
            val t3 = line.indexOf('\t', t2 + 1)
            // %-escaped fields skip the raw early-out (Spark re-checks
            // every filter post-scan, so keeping extra rows is safe;
            // dropping a row that would match after unescaping is not)
            def ok(set: Set[String], raw: String) =
              raw.contains('%') || set.contains(raw)
            sq.forall(ok(_, line.substring(0, t1))) &&
              ft.forall(ok(_, line.substring(t2 + 1, t3)))
        }
        if (keep) {
          val toParse = if (needsAttributes) line
          else line.substring(0, line.lastIndexOf('\t') + 1) + "." // blank col 9
          Gff3.parseLine(toParse).foreach(r => current = r)
        }
      }
    }
    true
  }

  override def get(): InternalRow = pruneProjection(serializer(current)).copy()

  override def close(): Unit = reader.close()
}

package graft.sources

import java.util.regex.Pattern

import scala.jdk.CollectionConverters._

import graft.etl.WikiXml
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for MediaWiki `pages-articles` export XML —
  * the full-connector form of the engine's dump ingestion (the third
  * ingestion mode next to the batch `lineSep` scan and the streaming
  * reader, both in `graft.etl.WikiXml` / `graft.streaming.WikiStream`).
  *
  * {{{ spark.read.format(classOf[WikiDumpSource].getName).load(dir) }}}
  *
  * What the connector surface buys over the text-scan route:
  *   - **Partition planning**: one input partition per dump file — a
  *     multi-file export (the real layout of a full wiki dump) fans out
  *     across executors with no driver-side union.
  *   - **Column pruning pushed into the reader**
  *     (`SupportsPushDownRequiredColumns`): a `select(title)` never
  *     runs the entity unescape over megabytes of page text —
  *     the reader materializes only requested fields.
  *   - **Streamed records**: each file is scanned through a delimiter
  *     Scanner (`</page>` chunks), never loaded whole.
  *
  * Parsing semantics are IDENTICAL to `WikiXml.fromRaw` by shared code
  * (`WikiXml.unescapeXml`, same anchored regexes, same malformed-record
  * drop, same U+FFFD deletion for A5a errors="ignore" fidelity);
  * WikiDumpSourceSpec asserts row-for-row equality on the same dump.
  */
class WikiDumpSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WikiDumpSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    // single-path loads arrive as "path"; multi-path `.load(a, b, …)`
    // arrives as "paths", a JSON string array
    val paths: Seq[String] = Option(properties.get("paths")
      ).map { js =>
        new com.fasterxml.jackson.databind.ObjectMapper()
          .readValue(js, classOf[Array[String]]).toSeq
      }.orElse(Option(properties.get("path")).map(Seq(_)))
      .getOrElse(throw new IllegalArgumentException(
        "wikidump source requires at least one path: .load(<file-or-dir>, ...)"))
    new WikiDumpTable(paths)
  }
}

object WikiDumpSource {
  val schema: StructType = StructType(Seq(
    StructField("title", StringType), StructField("ns", IntegerType),
    StructField("aid", LongType), StructField("text", StringType)))

  private val TitleRe = Pattern.compile("(?s)<title>(.*?)</title>")
  private val NsRe = Pattern.compile("(?s)<ns>(.*?)</ns>")
  private val IdRe = Pattern.compile("(?s)<id>([0-9]+)</id>")
  private val TextRe = Pattern.compile("(?s)<text[^>]*>(.*?)</text>")
  private val NsDigits = Pattern.compile("^[0-9]+$")

  private def extract(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) m.group(1) else ""
  }

  /** One `</page>`-delimited chunk → (title, ns, aid, text), or None
    * for the trailing fragment / malformed records — the same
    * skip-on-failure posture as `WikiXml.fromRaw`. With
    * `withText = false` (column-pruned scans) the text field is never
    * extracted or unescaped — the point of pushing pruning into the
    * reader. */
  def parseRecord(chunk: String, withText: Boolean = true): Option[(String, Int, Long, String)] = {
    val rec = chunk.replace("�", "") // A5a: delete, don't replace
    val title = extract(TitleRe, rec)
    val ns = extract(NsRe, rec)
    val aid = extract(IdRe, rec)
    if (title.isEmpty || aid.isEmpty || !NsDigits.matcher(ns).matches()) None
    else Some((WikiXml.unescapeXml(title), ns.toInt, aid.toLong,
      if (withText) WikiXml.unescapeXml(extract(TextRe, rec)) else ""))
  }

  /** Dump files under `path` (a file, or a directory scanned
    * non-recursively), sorted for deterministic partition order. */
  def listFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(_.isFile).map(_.getPath).sorted.toSeq
    else Seq(path)
  }
}

class WikiDumpTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"wikidump(`${paths.mkString(",")}`)"
  override def schema(): StructType = WikiDumpSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WikiDumpScanBuilder(paths)
}

class WikiDumpScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WikiDumpSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new WikiDumpScan(paths, required)
}

case class WikiDumpFilePartition(file: String) extends InputPartition

class WikiDumpScan(paths: Seq[String], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"wikidump ${paths.mkString(",")} [${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    paths.flatMap(WikiDumpSource.listFiles)
      .map(WikiDumpFilePartition.apply).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new WikiDumpReaderFactory(required)
}

class WikiDumpReaderFactory(required: StructType)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val file = partition.asInstanceOf[WikiDumpFilePartition].file
      // Scanner streams the file in </page> chunks; the UTF-8 decoder
      // substitutes malformed bytes with U+FFFD, which parseRecord then
      // deletes (reference errors="ignore" semantics).
      private val in = new java.io.FileInputStream(file)
      private val scanner = new java.util.Scanner(in, "UTF-8")
        .useDelimiter(Pattern.quote("</page>"))
      // which parsed field feeds each required output column
      private val fieldIdx: Array[Int] =
        required.fieldNames.map(WikiDumpSource.schema.fieldIndex)
      private val needText = fieldIdx.contains(3)
      private var row: InternalRow = _

      override def next(): Boolean = {
        row = null
        while (row == null && scanner.hasNext) {
          WikiDumpSource.parseRecord(scanner.next(), needText).foreach { t =>
            val full: Array[Any] = Array(
              UTF8String.fromString(t._1), t._2, t._3, UTF8String.fromString(t._4))
            row = new GenericInternalRow(fieldIdx.map(i => full(i)))
          }
        }
        row != null
      }

      override def get(): InternalRow = row
      override def close(): Unit = { scanner.close(); in.close() }
    }
}

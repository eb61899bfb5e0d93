package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import scala.jdk.CollectionConverters._

/** PHYSICAL-encoding drift guard (VERDICT r13 #7), the footer-level
  * sibling of TablesSchemaSpec. TablesSchemaSpec pins the LOGICAL
  * schema after `Tables.load`; it cannot see a physical regeneration
  * that Spark happens to read back to the same logical type today but
  * that shifts semantics (the r12 incident: events.ts silently went
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS, utc=false) and surfaced as 21
  * scattered analysis errors). This spec reads each table's parquet
  * footer directly and pins every leaf column's physical primitive
  * type + logical annotation at all three SFs, so the next driver
  * regeneration of ANY table surfaces as one readable assert naming
  * the drifted leaf.
  *
  * events.ts is the deliberate exception: `Tables.loadEvents`
  * normalizes every TIMESTAMP-annotated INT64 encoding (nanos /
  * micros / millis, adjusted or not) to the same session-UTC instant,
  * so the pin there is the ACCEPTED FAMILY, not one encoding —
  * a regeneration within the family must keep passing (that is the
  * loader's whole contract, EventsEncodingSpec pins the arms).
  */
class ParquetEncodingSpec extends SparkTestBase {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** Leaf column paths -> "PHYSICAL:ANNOTATION" from the parquet footer
    * of the first data file (driver testdata ships one file per table;
    * directory layouts are handled for robustness).
    */
  private def leaves(tablePath: String): Seq[(String, String)] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(tablePath)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).minBy(_.getName.toString)
      else p
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      r.getFooter.getFileMetaData.getSchema.getColumns.asScala.toSeq.map { cd =>
        val prim = cd.getPrimitiveType
        val ann = Option(prim.getLogicalTypeAnnotation)
          .map(_.toString).getOrElse("-")
        cd.getPath.mkString(".") -> s"${prim.getPrimitiveTypeName}:$ann"
      }
    } finally r.close()
  }

  private val Str = "BINARY:STRING"
  private val I64 = "INT64:-"
  private val I32 = "INT32:-"
  private val Dbl = "DOUBLE:-"
  private val TsMicrosNtz = "INT64:TIMESTAMP(MICROS,false)"

  /** Pinned from the r12-regenerated testdata (identical at all SFs).
    * A `TsFamily` value accepts any TIMESTAMP-annotated INT64 — the
    * set `Tables.loadEvents` normalizes.
    */
  private val TsFamily = "INT64:TIMESTAMP(*)"
  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> I32, "r_name" -> Str),
    "nation" -> Seq("n_nationkey" -> I32, "n_name" -> Str,
      "n_regionkey" -> I32),
    "customer" -> Seq("c_custkey" -> I64, "c_name" -> Str,
      "c_nationkey" -> I32, "c_acctbal" -> Dbl, "c_mktsegment" -> Str),
    "supplier" -> Seq("s_suppkey" -> I64, "s_name" -> Str,
      "s_nationkey" -> I32, "s_acctbal" -> Dbl),
    "part" -> Seq("p_partkey" -> I64, "p_name" -> Str, "p_brand" -> Str,
      "p_type" -> Str, "p_size" -> I32, "p_retailprice" -> Dbl),
    "orders" -> Seq("o_orderkey" -> I64, "o_custkey" -> I64,
      "o_orderstatus" -> Str, "o_totalprice" -> Dbl,
      "o_orderdate" -> TsMicrosNtz, "o_orderpriority" -> Str),
    "lineitem" -> Seq("l_orderkey" -> I64, "l_partkey" -> I64,
      "l_suppkey" -> I64, "l_linenumber" -> I32, "l_quantity" -> Dbl,
      "l_extendedprice" -> Dbl, "l_discount" -> Dbl, "l_tax" -> Dbl,
      "l_returnflag" -> Str, "l_linestatus" -> Str,
      "l_shipdate" -> TsMicrosNtz),
    "events" -> Seq("event_id" -> I64, "ts" -> TsFamily,
      "user_id" -> I64, "event_type" -> Str, "value" -> Dbl,
      "props" -> Str),
    "documents" -> Seq("doc_id" -> I64, "text" -> Str, "lang" -> Str,
      "source" -> Str, "n_chars" -> I64),
    "embeddings" -> Seq("vec_id" -> I64,
      "embedding.list.element" -> "FLOAT:-", "label" -> I32)
  )

  private def matches(exp: String, got: String): Boolean =
    if (exp == TsFamily) got.matches("""INT64:TIMESTAMP\(.*\)""")
    else exp == got

  for (dir <- sfDirs; (table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$table physical encoding stable at $dir") {
      val got = leaves(s"$dir/$table.parquet")
      val ok = got.size == cols.size &&
        cols.zip(got).forall { case ((en, ee), (gn, ge)) =>
          en == gn && matches(ee, ge)
        }
      assert(ok,
        s"\nTESTDATA PHYSICAL-ENCODING DRIFT for '$table' at $dir:" +
        s"\n  expected: ${cols.map { case (n, e) => s"$n=$e" }.mkString(", ")}" +
        s"\n  actual:   ${got.map { case (n, e) => s"$n=$e" }.mkString(", ")}" +
        "\nThe driver regenerated /root/testdata with a new physical " +
        "encoding. If Spark still reads the same logical schema " +
        "(TablesSchemaSpec green), re-pin the changed leaf here after " +
        "confirming the oracle (DuckDB) decodes it identically; " +
        "otherwise adapt graft.Tables.load first (see loadEvents).")
    }
  }
}

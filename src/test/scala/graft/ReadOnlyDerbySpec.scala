package graft

import graft.etl.ReadOnlyDerby
import org.apache.spark.sql.functions._

/** The multi-JVM JDBC source (VERDICT r19 "what's missing" #4 / next-round
  * residue): embedded Derby is single-process for WRITABLE databases, so
  * the r19 local-cluster sweep had to skip every JDBC row. The jar-deployed
  * read-only form (`jdbc:derby:jar:(path)db`) is Derby's documented
  * multi-JVM deployment — this spec proves the mechanics the sweep relies
  * on: correctness vs the parquet truth, filter pushdown + 4-way
  * range-partitioned scan, build-once publication, and a REAL second-JVM
  * concurrent open (forked `java` process) while this JVM holds its own
  * connection — the exact condition a writable embedded database fails
  * with "another instance of Derby may have already booted".
  *
  * Network-server mode would be the other route, but the image ships only
  * derby/derbyshared/derbytools — no derbynet (DRDA server) and no
  * derbyclient, and the build is zero-egress, so jar deployment is the
  * only multi-JVM-capable shape available. The SINK direction stays
  * single-process by nature here (writes need a server database); its
  * executor-parallel write machinery is proven per-JVM in MySqlSinkSpec.
  */
class ReadOnlyDerbySpec extends SparkTestBase {

  private lazy val jar = graft.queries.Sources.customerRoJar(spark, sfDir)

  test("q_source_jdbc_ro: readback equals the parquet truth") {
    val got = graft.queries.Sources.queries("q_source_jdbc_ro")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val want = Tables.load(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 1000.0)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("predicate pushed into the database; 4-way range-partitioned scan") {
    val df = graft.queries.Sources.queries("q_source_jdbc_ro")(spark, sfDir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThan(C_ACCTBAL") || p.contains("GreaterThan(c_acctbal"), p)
    assert(p.contains("EqualTo(C_MKTSEGMENT") || p.contains("EqualTo(c_mktsegment"), p)
    val base = spark.read.format("jdbc")
      .option("url", ReadOnlyDerby.url(jar))
      .option("dbtable", "jdbc_customer")
      .option("user", "app").option("password", "app")
      .option("partitionColumn", "c_custkey")
      .option("lowerBound", "0").option("upperBound", "200000")
      .option("numPartitions", "4")
      .load()
    assert(base.rdd.getNumPartitions == 4)
  }

  test("build-once: a second snapshot call republishes nothing") {
    val path = java.nio.file.Paths.get(jar)
    val mtime = java.nio.file.Files.getLastModifiedTime(path)
    val again = graft.queries.Sources.customerRoJar(spark, sfDir)
    assert(again == jar)
    assert(java.nio.file.Files.getLastModifiedTime(path) == mtime)
  }

  test("a second JVM opens the same database WHILE this one holds a connection") {
    val url = ReadOnlyDerby.url(jar)
    val mine = java.sql.DriverManager.getConnection(url)
    try {
      val rs = mine.createStatement()
        .executeQuery("SELECT COUNT(*) FROM jdbc_customer")
      rs.next()
      val myCount = rs.getInt(1)
      assert(myCount > 0)
      // fork a real second JVM against the same jar; inherit this test
      // JVM's classpath (spark jars incl. derby + test classes)
      val javaBin = java.nio.file.Paths.get(
        System.getProperty("java.home"), "bin", "java").toString
      val pb = new ProcessBuilder(
        javaBin, "-cp", System.getProperty("java.class.path"),
        "graft.DerbyRoProbe", url)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
      val exit = proc.waitFor()
      assert(exit == 0, s"probe JVM failed (exit $exit):\n$out")
      assert(out.contains(s"probe_count=$myCount"), out)
      // and this JVM's connection is still live afterwards
      val rs2 = mine.createStatement()
        .executeQuery("SELECT c_name FROM jdbc_customer FETCH FIRST 1 ROWS ONLY")
      assert(rs2.next())
    } finally mine.close()
  }
}

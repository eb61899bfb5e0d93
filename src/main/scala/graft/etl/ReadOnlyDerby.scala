package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.DataFrame

/** Jar-deployed read-only Derby snapshots — the one embedded-Derby
  * deployment that MULTIPLE JVMs may open concurrently.
  *
  * Why this exists: the reference's query surface is SQL over the MySQL
  * it loads (`/root/reference/README.md:47-54`), and this image has no
  * database server — only the embedded Derby jars under /opt/spark/jars.
  * Embedded Derby is single-JVM for writable databases (the engine holds
  * `db.lck` for the life of the boot), so under a multi-JVM master
  * (`local-cluster[2,16,…]`) an executor can never open the driver's
  * live database, and `jdbc:derby:memory:` databases are PER-JVM — each
  * executor would silently see its own empty engine. Derby's documented
  * escape hatch is a READ-ONLY database deployed in a jar
  * (`jdbc:derby:jar:(path)db`): no lock file exists inside an archive,
  * every JVM boots its own read-only instance, and concurrent cross-JVM
  * reads are supported. That is exactly the shape a range-partitioned
  * Spark JDBC scan needs to run on REAL executor JVMs.
  *
  * Scale story: on a production cluster the database is a network server
  * (MySQL) and the URL is host-based — executors connect concurrently and
  * both the parallel partitioned read (`q_source_jdbc_ro`) and the
  * parallel batched write ([[MySqlSink.writer]]) apply unchanged. The jar
  * snapshot is the read-only-media stand-in that lets this image prove
  * the executor-side read path; the LOAD into the snapshot is driver-side
  * by necessity (a second JVM cannot write an embedded database), done as
  * a constant-memory streamed batch INSERT over `toLocalIterator` — never
  * a whole-table collect — and bounded by the dimension-table size it
  * exists to serve.
  *
  * Build-once discipline: the snapshot is keyed by caller-supplied key
  * (dataset dir), built under a unique scratch dir, and published by
  * ATOMIC rename of the finished jar — concurrent builders (a Bench and
  * a Verify on the same box) race safely because the content is
  * deterministic from the parquet input and the first rename wins.
  */
object ReadOnlyDerby {

  /** JDBC URL for a published snapshot jar. */
  def url(jarPath: String): String = s"jdbc:derby:jar:($jarPath)db"

  /** Build (once per key) a read-only Derby snapshot jar containing
    * `table` with `df`'s rows, and return its path. `ddl` creates the
    * table; the INSERT shape is derived from `df`'s column count.
    */
  def snapshot(df: DataFrame, key: String, table: String, ddl: String): String = {
    val root = Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_derbyro_v1_" + key.replaceAll("[^A-Za-z0-9]", "_"))
    val jar = root.resolve("db.jar")
    if (Files.exists(jar)) return jar.toString
    Files.createDirectories(root)
    val build = Files.createTempDirectory(root, "build-")
    val dbDir = build.resolve("db")
    val bootUrl = s"jdbc:derby:$dbDir;create=true"
    MySqlSink.bootstrap(bootUrl, "app", "app", Seq(ddl))
    loadRows(df, bootUrl, table)
    // clean shutdown of THIS database releases db.lck and checkpoints
    // every page to disk; 08006 is Derby's success signal for shutdown
    try java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir;shutdown=true")
    catch { case _: java.sql.SQLException => () }
    val tmpJar = build.resolve("db.jar.tmp")
    zipDb(dbDir, tmpJar)
    try Files.move(tmpJar, jar, StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileAlreadyExistsException => () } // a racer won; content identical
    rmTree(build)
    jar.toString
  }

  /** Constant-memory driver-side load: streamed `toLocalIterator`, one
    * prepared batch per 1000 rows, single commit. Driver-side because an
    * embedded database accepts writers from exactly one JVM — see the
    * class doc for why the executor-parallel writer path
    * ([[MySqlSink.writer]]) cannot apply to an embedded target under a
    * multi-JVM master. */
  private def loadRows(df: DataFrame, url: String, table: String): Unit = {
    val n = df.schema.length
    val conn = java.sql.DriverManager.getConnection(url, {
      val p = new java.util.Properties()
      p.setProperty("user", "app"); p.setProperty("password", "app"); p
    })
    try {
      conn.setAutoCommit(false)
      val ps = conn.prepareStatement(
        s"INSERT INTO $table VALUES (${Seq.fill(n)("?").mkString(",")})")
      try {
        var inBatch = 0
        val it = df.toLocalIterator()
        while (it.hasNext) {
          val row = it.next()
          var i = 0
          while (i < n) { ps.setObject(i + 1, row.get(i)); i += 1 }
          ps.addBatch()
          inBatch += 1
          if (inBatch == 1000) { ps.executeBatch(); inBatch = 0 }
        }
        if (inBatch > 0) ps.executeBatch()
        conn.commit()
      } finally ps.close()
    } finally conn.close()
  }

  /** Archive the shut-down database directory as `db/<relpath>` zip
    * entries (the layout `jdbc:derby:jar:(…)db` expects). Lock files are
    * skipped defensively — a clean shutdown removes them, and they must
    * not exist in a read-only deployment. */
  private def zipDb(dbDir: Path, outJar: Path): Unit = {
    val out = new ZipOutputStream(Files.newOutputStream(outJar))
    try {
      val walk = Files.walk(dbDir)
      try {
        val files = walk.iterator()
        while (files.hasNext) {
          val p = files.next()
          val rel = "db/" + dbDir.relativize(p).toString.replace('\\', '/')
          if (Files.isRegularFile(p) && !rel.endsWith(".lck")) {
            out.putNextEntry(new ZipEntry(rel))
            Files.copy(p, out)
            out.closeEntry()
          }
        }
      } finally walk.close() // the walk stream holds directory handles
    } finally out.close()
  }

  private def rmTree(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val kids = Files.list(p)
      try kids.iterator().forEachRemaining(rmTree) finally kids.close()
    }
    Files.deleteIfExists(p): Unit
  }
}

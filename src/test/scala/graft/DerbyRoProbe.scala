package graft

/** Forked-JVM probe for ReadOnlyDerbySpec's cross-JVM concurrency proof:
  * opens the given jar-deployed Derby URL from a SEPARATE process while
  * the spec's JVM holds its own open connection to the same database,
  * and prints the row count. Exit 0 + the printed count is the proof —
  * a writable embedded database would fail the second boot with
  * XJ040/XSDB6 ("another instance of Derby may have already booted"). */
object DerbyRoProbe {
  def main(args: Array[String]): Unit = {
    val conn = java.sql.DriverManager.getConnection(args(0))
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT COUNT(*) FROM jdbc_customer")
      rs.next()
      println(s"probe_count=${rs.getInt(1)}")
    } finally conn.close()
  }
}

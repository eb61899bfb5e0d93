package graft

import org.apache.spark.sql.functions._

/** Pins every dispatch arm of `Tables.loadEvents` on synthetic parquet,
  * independent of which encoding the driver's current testdata happens
  * to ship: BIGINT nanos (the pre-r12 TIMESTAMP(NANOS) generation reads
  * as LongType under `nanosAsLong`), TIMESTAMP_NTZ (the r12+
  * generation), plain TIMESTAMP, and the fail-fast arm for anything
  * else. All three value arms must decode the SAME wall-clock instants
  * so a future regeneration cannot flip semantics silently.
  */
class EventsEncodingSpec extends SparkTestBase {

  private def tmp(tag: String) =
    s"/tmp/graft-evt-enc-$tag-${System.nanoTime()}"

  // one known instant: 2024-06-15 12:34:56.789012 UTC
  private val micros = 1718454896789012L

  private def expectTs(dir: String): Unit = {
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType,
      s"ts must normalize to session-UTC TimestampType, got ${got.schema("ts").dataType}")
    val s = got.selectExpr("cast(ts as string)").collect()(0).getString(0)
    assert(s === "2024-06-15 12:34:56.789012", s"decoded instant drifted: $s")
  }

  private def writeWith(dir: String, tsExpr: String): Unit =
    spark.range(1).select(
      lit(1L).as("event_id"),
      expr(tsExpr).as("ts"),
      lit(7L).as("user_id"),
      lit("click").as("event_type"),
      lit(1.5).as("value"),
      lit("{}").as("props")
    ).write.parquet(s"$dir/events.parquet")

  test("BIGINT nanos arm: legacy TIMESTAMP(NANOS)-as-long truncates to micros") {
    val dir = tmp("nanos")
    // physical BIGINT carrying nanos since epoch — byte-identical to
    // what nanosAsLong yields for the old TIMESTAMP(NANOS) files,
    // including a sub-microsecond remainder that must truncate away
    writeWith(dir, s"${micros}L * 1000L + 789L")
    expectTs(dir)
  }

  test("TIMESTAMP_NTZ arm: wall-clock micros reinterpreted as the same UTC instant") {
    val dir = tmp("ntz")
    writeWith(dir, s"cast(timestamp_micros(${micros}L) as timestamp_ntz)")
    expectTs(dir)
  }

  test("TIMESTAMP arm: already session-UTC, passes through unchanged") {
    val dir = tmp("tz")
    writeWith(dir, s"timestamp_micros(${micros}L)")
    expectTs(dir)
  }

  test("unknown encoding fails with the descriptive drift error") {
    val dir = tmp("bad")
    writeWith(dir, "'2024-06-15 12:34:56'") // ts as STRING
    val e = intercept[IllegalStateException] {
      Tables.load(spark, dir, "events").collect()
    }
    assert(e.getMessage.contains("unsupported type"))
    assert(e.getMessage.contains("TablesSchemaSpec"))
  }
}

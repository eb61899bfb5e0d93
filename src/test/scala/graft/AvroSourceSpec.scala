package graft

import graft.sources.AvroSource
import org.apache.spark.sql.functions._

/** AvroSource (DataSource V2, sources/AvroSource.scala): roundtrip
  * fidelity, sync-marker split correctness, decoder-level column
  * pruning, and nullability — the properties the DuckDB oracle can't
  * see (it has no Avro reader; q_source_avro oracles the roundtrip
  * against the parquet table instead). */
class AvroSourceSpec extends SparkTestBase {

  private def tmp(tag: String) =
    s"/tmp/graft-avro-$tag-${System.nanoTime()}"

  test("roundtrip: every supported type survives write -> read bit-exact") {
    val dir = tmp("rt")
    val df = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"),
        col("c_acctbal").cast("double").as("bal"),
        col("c_custkey").cast("int").as("ik"),
        col("c_acctbal").cast("float").as("fk"),
        (col("c_custkey") % 2 === 0).as("even"),
        md5(col("c_name").cast("binary")).cast("binary").as("bin"),
        when(col("c_custkey") % 3 === 0, col("c_name")).as("opt"))
    AvroSource.write(df, dir)
    val back = spark.read.format(classOf[AvroSource].getName).load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy("c_custkey").collect()
    val b = back.orderBy("c_custkey").collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      (0 until x.length).foreach { i =>
        (x.get(i), y.get(i)) match {
          case (p: Array[Byte], q: Array[Byte]) => assert(p.sameElements(q))
          case (p, q) => assert(p === q, s"col $i")
        }
      }
    }
    // nullability: the conditional column actually produced nulls
    assert(back.where(col("opt").isNull).count() > 0)
  }

  test("byte-range splits read every record exactly once") {
    val dir = tmp("split")
    val df = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority")).coalesce(1)
    AvroSource.write(df, dir)
    val n = df.count()
    // tiny splits force many partitions with boundaries mid-block
    val back = spark.read.format(classOf[AvroSource].getName)
      .option("splitSize", "4096").load(dir)
    assert(back.rdd.getNumPartitions > 4,
      s"expected many splits, got ${back.rdd.getNumPartitions}")
    assert(back.count() === n)
    assert(back.select(sum("o_orderkey")).head().getLong(0) ===
      df.select(sum("o_orderkey")).head().getLong(0))
  }

  test("column pruning reaches the scan (ReadSchema) and skips decode") {
    val dir = tmp("prune")
    AvroSource.write(Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment")), dir)
    val q = spark.read.format(classOf[AvroSource].getName).load(dir)
      .select(col("c_custkey"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<c_custkey:bigint>"),
      s"pruned scan description missing in:\n$plan")
    assert(!plan.contains("c_mktsegment"), "unpruned column in scan")
    assert(q.agg(sum("c_custkey")).head().getLong(0) > 0)
  }

  test("NESTED column pruning is pushed into the scan: unprojected " +
    "nested fields leave the ReadSchema") {
    val dir = tmp("prune-nested")
    AvroSource.write(Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), struct(col("label").as("lab"),
        (col("vec_id") % 4).as("grp")).as("meta"), col("embedding"))
      .coalesce(1), dir)
    val q = spark.read.format(classOf[AvroSource].getName).load(dir)
      .select(col("meta.grp"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<meta:struct<grp:bigint>>"),
      s"nested pruning did not reach the scan:\n$plan")
    assert(!plan.contains("lab") && !plan.contains("embedding"),
      s"unprojected nested field survived in:\n$plan")
    assert(q.agg(sum("grp")).head().getLong(0) > 0)
  }

  test("logical types roundtrip losslessly: decimal, timestamp-micros, " +
    "date — and splits stay exact under logical decoding") {
    val dir = tmp("logical")
    val df = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,6)").as("dec_price"),
        col("o_orderdate").cast("timestamp").as("ts_utc"),
        col("o_orderdate").cast("date").as("dt"),
        // null branches exercise [null, logical] unions
        when(col("o_orderkey") % 3 === 0,
          col("o_totalprice").cast("decimal(12,2)")).as("dec_opt"))
      .coalesce(1)
    AvroSource.write(df, dir)
    val back = spark.read.format(classOf[AvroSource].getName)
      .option("splitSize", "4096").load(dir)
    assert(back.rdd.getNumPartitions > 2,
      s"expected multi-split read, got ${back.rdd.getNumPartitions}")
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy("o_orderkey").collect()
    val b = back.orderBy("o_orderkey").collect()
    assert(a.length === b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      (0 until x.length).foreach(i => assert(x.get(i) === y.get(i), s"col $i"))
    }
    assert(back.where(col("dec_opt").isNull).count() > 0)
  }

  test("timestamp-millis reads convert to micros (never raw-long corruption)") {
    // a file written by a FOREIGN tool with millis timestamps: the
    // resolving decoder hands back raw millis longs, so the source must
    // apply the x1000 itself — write one via the raw avro API
    import org.apache.avro.{Schema => A}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new A.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},
        |{"name":"t","type":{"type":"long","logicalType":"timestamp-millis"}},
        |{"name":"topt","type":["null",{"type":"long","logicalType":"timestamp-millis"}]}]}"""
        .stripMargin)
    val dir = new java.io.File(tmp("millis")); dir.mkdirs()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
      .create(schema, new java.io.File(dir, "part-00000.avro"))
    val base = 1704067200000L // 2024-01-01 00:00:00 UTC in millis
    try (0 until 5).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put(0, i.toLong)
      r.put(1, java.lang.Long.valueOf(base + i * 1500L))
      r.put(2, if (i % 2 == 0) java.lang.Long.valueOf(base + i) else null)
      w.append(r)
    } finally w.close()
    val back = spark.read.format(classOf[AvroSource].getName)
      .load(dir.getPath).orderBy("id")
    assert(back.schema("t").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val got = back.select(col("id"), col("t").cast("long").as("sec"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cast-to-long yields epoch SECONDS: raw-millis corruption would be
    // off by 1000x and land decades away
    assert(got == (0 until 5).map(i =>
      i.toLong -> (base / 1000 + i * 1500 / 1000)).toMap, got.toString)
    assert(back.where(col("topt").isNull).count() == 2)
  }

  test("unsupported avro shapes fail fast with a clear message") {
    // enum is outside the subset; multi-branch unions are not [null, T]
    val err = intercept[IllegalArgumentException] {
      AvroSource.toSparkSchema(new org.apache.avro.Schema.Parser().parse(
        """{"type":"record","name":"r","fields":[
          |{"name":"e","type":{"type":"enum","name":"c","symbols":["A","B"]}}]}"""
          .stripMargin))
    }
    assert(err.getMessage.contains("unsupported"))
    val err2 = intercept[IllegalArgumentException] {
      AvroSource.toSparkSchema(new org.apache.avro.Schema.Parser().parse(
        """{"type":"record","name":"r","fields":[
          |{"name":"u","type":["int","string"]}]}""".stripMargin))
    }
    assert(err2.getMessage.contains("union"))
  }

  // ---- nested types (r20, VERDICT r19 #4) ---------------------------

  test("nested roundtrip: array/map/record with nulls at every depth, " +
    "splits stay exact under nested decoding") {
    val dir = tmp("nested")
    val df = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        // null ARRAY every 7th row; the rest keep their floats
        when(col("vec_id") % 7 =!= 0, col("embedding")).as("emb"),
        // nested record, itself null every 5th row, with a nullable
        // field inside
        when(col("vec_id") % 5 =!= 0,
          struct(col("label").as("lab"),
            when(col("vec_id") % 3 === 0, col("vec_id")).as("opt"),
            (col("vec_id") % 4).as("grp"))).as("meta"),
        // string-keyed map with a nullable value
        map(lit("a"), col("vec_id") * 10,
          lit("b"), when(col("vec_id") % 2 === 0, col("vec_id"))).as("props"),
        // array of records — both nestings composed
        array(struct(lit("x").as("k"), col("vec_id").as("v")),
          struct(lit("y").as("k"), (col("vec_id") + 1).as("v"))).as("tags"))
      .coalesce(1)
    AvroSource.write(df, dir)
    val back = spark.read.format(classOf[AvroSource].getName)
      .option("splitSize", "4096").load(dir)
    assert(back.rdd.getNumPartitions > 2,
      s"expected multi-split read, got ${back.rdd.getNumPartitions}")
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    // row-for-row equality through keyed access (avro map iteration
    // order is a hash order — only element_at is deterministic)
    def flat(x: org.apache.spark.sql.DataFrame) = x.select(col("vec_id"),
      col("emb"), col("meta.lab"), col("meta.opt"), col("meta.grp"),
      element_at(col("props"), "a").as("pa"),
      element_at(col("props"), "b").as("pb"),
      expr("transform(tags, t -> concat(t.k, ':', t.v))").as("tagstr"))
      .orderBy("vec_id").collect().toSeq
    assert(flat(back) == flat(df) && flat(back).nonEmpty)
    assert(back.where(col("emb").isNull).count() > 0)
    assert(back.where(col("meta").isNull).count() > 0)
    assert(back.where(element_at(col("props"), "b").isNull).count() > 0)
  }

  test("nested column pruning: the pruned reader schema drops " +
    "unprojected nested fields entirely") {
    val writer = AvroSource.toAvroSchema(
      Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"),
          struct(col("label").as("lab"), col("vec_id").as("opt"),
            (col("vec_id") % 4).as("grp")).as("meta"),
        col("embedding")).schema, "graft_record")
    val required = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("meta",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("grp",
            org.apache.spark.sql.types.LongType))))))
    val pruned = AvroSource.pruneWriterSchema(writer, required)
    val s = pruned.toString
    assert(s.contains("grp"))
    assert(!s.contains("lab") && !s.contains("opt") && !s.contains("embedding"),
      s"unprojected fields survived pruning: $s")
    // and writer record names are preserved so resolution matches
    assert(pruned.getName == writer.getName)
  }

  test("timestamp-millis NESTED in a record converts to micros too") {
    import org.apache.avro.{Schema => A}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new A.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},
        |{"name":"evt","type":{"type":"record","name":"e","fields":[
        |  {"name":"t","type":{"type":"long","logicalType":"timestamp-millis"}},
        |  {"name":"tag","type":"string"}]}}]}""".stripMargin)
    val dir = new java.io.File(tmp("nested-millis")); dir.mkdirs()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
      .create(schema, new java.io.File(dir, "part-00000.avro"))
    val base = 1704067200000L
    try (0 until 4).foreach { i =>
      val e = new GenericData.Record(schema.getField("evt").schema)
      e.put(0, java.lang.Long.valueOf(base + i * 2500L))
      e.put(1, s"tag$i")
      val r = new GenericData.Record(schema)
      r.put(0, i.toLong); r.put(1, e)
      w.append(r)
    } finally w.close()
    val back = spark.read.format(classOf[AvroSource].getName)
      .load(dir.getPath).orderBy("id")
    assert(back.schema("evt").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType]("t").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val got = back.select(col("id"), col("evt.t").cast("long").as("sec"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0 until 4).map(i =>
      i.toLong -> (base / 1000 + i * 2500 / 1000)).toMap, got.toString)
  }

  test("write refuses to clobber a file or a non-flat directory") {
    // regular file at the target: deleted and replaced, no NPE
    val asFile = tmp("clobber-file")
    java.nio.file.Files.write(java.nio.file.Paths.get(asFile),
      "not a directory".getBytes)
    val df = Tables.load(spark, sfDir, "region").select(col("r_regionkey"))
    AvroSource.write(df, asFile)
    assert(spark.read.format(classOf[AvroSource].getName)
      .load(asFile).count() === df.count())
    // directory containing a subdirectory: fail fast, not silent no-op
    val nested = tmp("clobber-nested")
    assert(new java.io.File(nested, "sub").mkdirs())
    val err = intercept[java.io.IOException] { AvroSource.write(df, nested) }
    assert(err.getMessage.contains("subdirectory"))
  }

  test("schema-inference cache: repeat plans hit it, a changed file misses it") {
    // the cache key is (path, size, mtime) per file — a second plan over
    // unchanged files serves the cached schema, but REPLACING a file at
    // the same path must re-infer, never serve the stale struct
    val dir = tmp("cache")
    val narrow = Tables.load(spark, sfDir, "region").select(col("r_regionkey"))
    AvroSource.write(narrow.coalesce(1), dir)
    def planSchema() = spark.read.format(classOf[AvroSource].getName)
      .load(dir).schema.fieldNames.toSeq
    assert(planSchema() === Seq("r_regionkey"))
    assert(planSchema() === Seq("r_regionkey")) // second plan: cached path
    // replace with a wider schema at the SAME directory
    val wide = Tables.load(spark, sfDir, "region")
      .select(col("r_regionkey"), col("r_name"))
    AvroSource.write(wide.coalesce(1), dir)
    assert(planSchema() === Seq("r_regionkey", "r_name"),
      "stale cached schema served after the file changed")
  }

  test("heterogeneous writer schemas are rejected at plan time") {
    val dir = tmp("hetero")
    val a = Tables.load(spark, sfDir, "region").select(col("r_regionkey"))
    val b = Tables.load(spark, sfDir, "region")
      .select(col("r_regionkey"), col("r_name"))
    AvroSource.write(a.coalesce(1), dir)
    val dirB = tmp("hetero-b")
    AvroSource.write(b.coalesce(1), dirB)
    // splice one of B's container files into A's directory
    val bFile = new java.io.File(dirB).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    java.nio.file.Files.copy(bFile.toPath,
      new java.io.File(dir, "part-zzz.avro").toPath)
    val err = intercept[Exception] {
      spark.read.format(classOf[AvroSource].getName).load(dir).count()
    }
    assert(err.getMessage.contains("heterogeneous"),
      s"expected plan-time schema mismatch, got: ${err.getMessage}")
  }

  test("files removed after analysis: the scan is empty, not a plan error") {
    // inferSchema saw the files at load(); if they vanish before scan
    // construction (retention sweep, concurrent cleanup), the scan must
    // plan zero splits and return zero rows — the pre-r20 factory's
    // behavior — rather than fail building readerSchemaJson
    val dir = tmp("vanish")
    AvroSource.write(
      Tables.load(spark, sfDir, "nation")
        .select(col("n_nationkey"), col("n_name")), dir)
    val back = spark.read.format(classOf[AvroSource].getName).load(dir)
    assert(back.schema.fieldNames.sameElements(Array("n_nationkey", "n_name")))
    val d = new java.io.File(dir)
    d.listFiles().filter(_.getName.endsWith(".avro")).foreach(f =>
      assert(f.delete()))
    assert(back.count() === 0)
    assert(back.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      .contains("avro"))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Regression pin for the events loader: the driver's testdata has
  * shipped `events.ts` as parquet TIMESTAMP(NANOS) in some generations
  * and TIMESTAMP(µs) in others (round 7 regenerated µs and the
  * nanos-only loader took 13 queries and 9 specs down with it).
  * [[Tables.loadFresh]] must adapt to whatever the footer says and
  * yield the SAME instants either way. Fixtures are written with the
  * raw parquet-java API because Spark itself cannot produce
  * TIMESTAMP(NANOS) files.
  */
class TablesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s
  }

  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.hadoop.example.ExampleParquetWriter
  import org.apache.parquet.schema.LogicalTypeAnnotation
  import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
  import org.apache.parquet.schema.Types

  /** Three instants straddling a µs that does not divide evenly into
    * ms, so a lossy ms-precision path would be caught. */
  private val micros = Seq(
    1700000000123456L, // 2023-11-14T22:13:20.123456Z
    1700000001000001L,
    951782400000007L)  // 2000-02-29 leap day

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("tables_spec").toString

  /** Writes `$dir/$table.parquet` with `tsCol` as INT64 annotated
    * TIMESTAMP(`unit`, isAdjustedToUTC=`utc`), one row per instant. */
  private def writeTs(dir: String, table: String, tsCol: String,
                      unit: TimeUnit, utc: Boolean): String = {
    val schema = Types.buildMessage()
      .addField(Types.required(INT64).named("id"))
      .addField(Types.required(INT64)
        .as(LogicalTypeAnnotation.timestampType(utc, unit)).named(tsCol))
      .named(table)
    val scale = unit match {
      case TimeUnit.NANOS  => 1000L
      case TimeUnit.MICROS => 1L
      case TimeUnit.MILLIS => sys.error("unused")
    }
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/$table.parquet"))
      .withType(schema)
      .build()
    val factory = new SimpleGroupFactory(schema)
    micros.zipWithIndex.foreach { case (us, i) =>
      val g = factory.newGroup()
      g.add("id", i.toLong)
      g.add(tsCol, us * scale)
      writer.write(g)
    }
    writer.close()
    dir
  }

  private def writeEvents(dir: String, unit: TimeUnit, utc: Boolean): String =
    writeTs(dir, "events", "ts", unit, utc)

  private def instants(dir: String): Seq[java.sql.Timestamp] =
    Tables.load(spark, dir, "events")
      .orderBy("id").select("ts").collect()
      .map(_.getTimestamp(0)).toSeq

  test("nanos, ntz-micros and utc-micros events all load to the same TIMESTAMP instants") {
    val ntzMicrosDir = writeEvents(tmpDir(), TimeUnit.MICROS, utc = false) // round-7 pyarrow shape
    val utcMicrosDir = writeEvents(tmpDir(), TimeUnit.MICROS, utc = true)
    val nanosDir     = writeEvents(tmpDir(), TimeUnit.NANOS,  utc = false) // round-6 shape

    for (d <- Seq(ntzMicrosDir, utcMicrosDir, nanosDir))
      assert(Tables.load(spark, d, "events").schema("ts").dataType === TimestampType,
        s"ts must surface as session-zone TIMESTAMP from $d")

    val expected = micros.map { us =>
      val t = new java.sql.Timestamp(us / 1000000L * 1000L)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }
    assert(instants(ntzMicrosDir) === expected)
    assert(instants(utcMicrosDir) === expected)
    assert(instants(nanosDir) === expected)
  }

  test("cached nanos plan re-establishes nanosAsLong at execution time") {
    val nanosDir = writeEvents(tmpDir(), TimeUnit.NANOS, utc = false)
    Tables.load(spark, nanosDir, "events").count() // prime the cache
    // another query path turns the legacy flag off...
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    // ...and the cache hit must still execute (load() restores the conf)
    assert(Tables.load(spark, nanosDir, "events").count() === micros.size)
  }

  test("loading a micros fixture does not flip session conf") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    Tables.load(spark, writeEvents(tmpDir(), TimeUnit.MICROS, utc = false), "events").count()
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") === "false")
  }

  test("nanos drift on orders/lineitem date columns survives the load") {
    // the same generation flip that hit events.ts in round 7 could hit
    // the other timestamp columns next — the loader must adapt there too
    val ordersDir = writeTs(tmpDir(), "orders", "o_orderdate",
      TimeUnit.NANOS, utc = false)
    val o = Tables.load(spark, ordersDir, "orders")
    assert(o.schema("o_orderdate").dataType === TimestampType)
    assert(o.count() === micros.size)
    val liDir = writeTs(tmpDir(), "lineitem", "l_shipdate",
      TimeUnit.NANOS, utc = false)
    assert(Tables.load(spark, liDir, "lineitem")
      .schema("l_shipdate").dataType === TimestampType)
  }

  test("embeddings shipped as double normalize to array<float>") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    Seq((1L, Seq(0.25, -1.5)), (2L, Seq(0.5, 3.0)))
      .toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val e = Tables.load(spark, dir, "embeddings")
    assert(e.schema("embedding").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, true))
    val v = e.orderBy("vec_id").collect()(0).getSeq[Float](1)
    assert(v === Seq(0.25f, -1.5f))
  }

  test("registerAll isolates a corrupted table: other views stay queryable") {
    val dir = tmpDir()
    // real small tables + a garbage events file
    for (t <- Seq("region", "nation")) {
      val src = java.nio.file.Paths.get(s"/root/testdata/sf0.001/$t.parquet")
      val dst = java.nio.file.Paths.get(s"$dir/$t.parquet")
      if (java.nio.file.Files.isDirectory(src)) {
        java.nio.file.Files.walk(src).forEach { p =>
          val rel = src.relativize(p)
          val to = dst.resolve(rel.toString)
          if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(to)
          else java.nio.file.Files.copy(p, to)
        }
      } else java.nio.file.Files.copy(src, dst)
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      "this is not a parquet file".getBytes)

    Tables.registerAll(spark, dir) // must not throw
    assert(spark.sql("SELECT count(*) AS n FROM nation").collect()(0).getLong(0) === 25L)
    assert(spark.sql(
      "SELECT r_name FROM region WHERE r_regionkey IN (SELECT n_regionkey FROM nation)")
      .count() === 5L)
  }
}

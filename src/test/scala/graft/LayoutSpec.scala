package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Pins the file-layout properties [[Layout.writeSized]] promises:
  * hard row-count bound per file and pairwise-disjoint key ranges
  * (the property parquet footer stats need to prune whole files). */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("writeSized: bounded files, disjoint sorted key ranges, lossless") {
    val s = spark; import s.implicits._
    val df = (1L to 1500L).map(k => (k, k % 7)).toDF("k", "grp")
    val path = java.nio.file.Files
      .createTempDirectory("layout_spec").toString + "/t"
    val nFiles = Layout.writeSized(df, path, Seq(col("k")),
      targetRowsPerFile = 400L)
    assert(nFiles >= 4 && nFiles <= 8, s"nFiles=$nFiles")
    val files = Option(new java.io.File(path).listFiles()).get
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length === nFiles)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("k")), max(col("k")), count(lit(1))).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // hard cap holds for every file
    ranges.foreach { case (_, _, n) => assert(n <= 400L, s"file has $n rows") }
    // pairwise-disjoint ranges: sorted by min, each file starts after
    // the previous one ends (unique keys) — the file-skipping property
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, hi, _), (lo2, _, _)) => assert(lo2 > hi, s"overlap: $hi/$lo2")
      case _ =>
    }
    // lossless
    assert(spark.read.parquet(path).count() === 1500L)
    assert(spark.read.parquet(path).agg(sum(col("k"))).collect()
      .head.getLong(0) === 1500L * 1501L / 2)
  }

  test("z-order interleave: hand-computed bits; files tile BOTH dimensions") {
    val s = spark; import s.implicits._
    graft.functions.HashExpressions.register(spark)
    // z(5=101b, 3=011b) = a bits at even, b at odd positions = 27
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(graft.functions.HashExpressions.z_order16(col("a"), col("b")))
      .collect().head.getLong(0)
    assert(z === 27L)
    // 64x64 grid, 256-row files: z-order gives each file a small tile
    // in BOTH x and y; an x-sorted layout would span all of y (63)
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val path = java.nio.file.Files
      .createTempDirectory("layout_z").toString + "/grid"
    val nFiles = graft.operators.Layout.writeZOrdered(
      grid, path, col("x"), col("y"), targetRowsPerFile = 256L)
    assert(nFiles >= 16, s"nFiles=$nFiles")
    val spans = Option(new java.io.File(path).listFiles()).get
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(max(col("x")) - min(col("x")),
            max(col("y")) - min(col("y"))).collect().head
        (r.getLong(0), r.getLong(1))
      }
    // a perfect 256-row z-tile is 16x16 (span 15); range-partition
    // boundaries can straddle tiles, so allow double
    spans.foreach { case (sx, sy) =>
      assert(sx <= 32 && sy <= 32, s"file spans ($sx, $sy) — not tiled")
    }
  }

  test("z-order N=3: hand-computed interleave; files tile ALL THREE dimensions") {
    val s = spark; import s.implicits._
    graft.functions.HashExpressions.register(spark)
    // bit j of column c at position j*3 + c:
    // (1, 1, 1) -> bits 0,1,2 set = 7; (2, 0, 0) -> bit 1*3+0 = 8
    val z = Seq((1L, 1L, 1L, 2L, 0L, 0L)).toDF("a", "b", "c", "d", "e", "f")
      .select(
        graft.functions.HashExpressions.z_orderN(Seq(col("a"), col("b"), col("c"))),
        graft.functions.HashExpressions.z_orderN(Seq(col("d"), col("e"), col("f"))))
      .collect().head
    assert(z.getLong(0) === 7L)
    assert(z.getLong(1) === 8L)
    // 32^3 cube, 512-row files: each file must tile x, y AND w — a
    // single-key sort would span the full 31 in two of the three
    val cube = (for (x <- 0L until 32L; y <- 0L until 32L; w <- 0L until 32L)
      yield (x, y, w)).toDF("x", "y", "w")
    val path = java.nio.file.Files
      .createTempDirectory("layout_z3").toString + "/cube"
    val nFiles = Layout.writeZOrderedN(cube, path,
      Seq(col("x"), col("y"), col("w")), targetRowsPerFile = 512L)
    assert(nFiles >= 32, s"nFiles=$nFiles")
    val spans = Option(new java.io.File(path).listFiles()).get
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(max(col("x")) - min(col("x")),
            max(col("y")) - min(col("y")),
            max(col("w")) - min(col("w"))).collect().head
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
    // a perfect 512-row z-tile is 8x8x8 (span 7). Files whose range
    // straddles a z carry boundary (e.g. crossing 2^13 flips every
    // lower x/y/w bit at once) legitimately span wide — the standard
    // z-order boundary artifact, a few files at most. The LAYOUT
    // property is aggregate: the vast majority of files are tight
    // tiles, and mean spans sit near the perfect tile, nowhere near
    // the 31 a single-key sort leaves in its two non-sort dimensions.
    val tiled = spans.count { case (sx, sy, sw) =>
      sx <= 15 && sy <= 15 && sw <= 15 }
    assert(tiled.toDouble / spans.length >= 0.8,
      s"only $tiled/${spans.length} files are tiled: ${spans.mkString(",")}")
    def mean(f: ((Long, Long, Long)) => Long) =
      spans.map(f).sum.toDouble / spans.length
    assert(mean(_._1) <= 12 && mean(_._2) <= 12 && mean(_._3) <= 12,
      s"mean spans (${mean(_._1)}, ${mean(_._2)}, ${mean(_._3)})")
  }

  test("skipping manifest: pruned read opens a strict subset of files, result exact") {
    val s = spark; import s.implicits._
    val df = (1L to 4000L).map(k => (k, k * 3 % 11)).toDF("k", "v")
    val path = java.nio.file.Files
      .createTempDirectory("layout_skip").toString
    val nFiles = Layout.writeSkipping(df, path, col("k"),
      targetRowsPerFile = 500L)
    assert(nFiles >= 8, s"nFiles=$nFiles")
    // narrow range → few files opened; the manifest must prune
    val (pruned, opened, total) = Layout.skippingRead(s, path, "k", 900L, 1100L)
    assert(total === nFiles)
    assert(opened < total, s"no pruning: opened $opened of $total")
    // repartitionByRange samples boundaries, so a 201-key slice of a
    // ~500-key/file layout can straddle up to 3 files
    assert(opened <= 3, s"narrow 201-key range touched $opened files")
    val got = pruned.select("k").as[Long].collect().sorted
    assert(got.toSeq == (900L to 1100L).toSeq, s"rows diverged: ${got.length}")
    // empty intersection → zero files, zero rows, same schema
    val (empty, opened0, _) = Layout.skippingRead(s, path, "k", 100000L, 200000L)
    assert(opened0 === 0 && empty.count() === 0)
    assert(empty.schema === pruned.schema)
  }

  test("bloom manifest: point lookup on an unclustered key skips files") {
    val s = spark; import s.implicits._
    // layout clustered by k; lookups on h, which min/max cannot prune
    // (each file's [min(h), max(h)] spans ~the whole md5 space)
    val df = (1L to 4000L).map(k => (k,
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(k.toString)
          .substring(0, 13), 16))).toDF("k", "h")
    val path = java.nio.file.Files
      .createTempDirectory("layout_bloom").toString
    val nFiles = Layout.writeBloomSkipping(df, path, col("k"), col("h"),
      targetRowsPerFile = 500L)
    assert(nFiles >= 8, s"nFiles=$nFiles")
    // 3 query keys live in ≤ 3 files; blooms must find ≤ 3 + FP slack
    val want = Seq(42L, 1042L, 3999L)
    val keys = df.filter(col("k").isin(want: _*))
      .select("h").as[Long].collect().toSeq
    val (pruned, opened, total) = Layout.bloomSkipRead(s, path, "h", keys)
    assert(total === nFiles)
    assert(opened < total, s"no skipping: opened $opened of $total")
    val got = pruned.select("k").as[Long].collect().sorted
    assert(got.toSeq == want.sorted, s"rows diverged: ${got.mkString(",")}")
    // absent key (hash of a value outside the domain) → opens nothing
    // beyond FP noise and returns zero rows
    val (miss, openedMiss, _) =
      Layout.bloomSkipRead(s, path, "h", Seq(-1L))
    assert(miss.count() === 0)
    assert(openedMiss <= 1, s"absent key opened $openedMiss files")
  }
}

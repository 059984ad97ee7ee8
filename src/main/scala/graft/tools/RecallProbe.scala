package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity
import graft.sources.Tables

/** Parameter-grid recall probe for the ANN paths: prints recall@5 of
  * the LSH and IVF searches against the exact top-k, per (sf, params).
  * Used to pick the query parameterizations whose oracled recall rows
  * (`s_lsh_ann` / `s_ivf_ann`) prove recall 1 — all hashing is
  * deterministic and the corpus fixed, so a measured recall here is
  * THE recall the driver will see.
  *
  * {{{ runMain graft.tools.RecallProbe [sfDir] }}}
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val exact = Similarity.cosineTopK(emb, 10, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (bits <- Seq(2, 3, 4); tables <- Seq(16, 24, 32)) {
      val ann = Similarity.lshCosineTopK(emb, 10, 5, bits, tables)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"LSH bits=$bits tables=$tables%2d recall=${(ann & exact).size.toDouble / exact.size}%.3f")
    }
    for ((nCells, nProbe, refine) <- Seq((16, 4, 0), (16, 6, 2),
        (16, 12, 2), (16, 14, 2), (16, 12, 3), (8, 4, 2), (8, 5, 2),
        (8, 6, 2), (8, 6, 0), (4, 3, 0), (4, 3, 2))) {
      val ivf = Similarity.ivfCosineTopK(emb, 10, 5, nCells, nProbe, refine)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"IVF nCells=$nCells%2d nProbe=$nProbe%2d refine=$refine recall=${(ivf & exact).size.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}

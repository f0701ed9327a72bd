package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Writes a jittered ×mult embeddings table for recall measurement —
  * the NEAR-DUP-FAMILY regime probe.
  *
  * ScaleStress's pre-round-16 key-remapped copies were EXACT duplicates
  * of the base vectors, which made large-N recall measurement vacuous:
  * identical embeddings produce identical sign-projections, so every
  * copy lands in its original's IVF cell under ANY bucket-bit law and
  * sampled recall@5 reads 1.0 regardless of the law (measured round 16,
  * ×100, both laws). ScaleStress now grows embeddings as per-copy
  * ISOMETRIES (new content — the realistic growth model), so recall on
  * its dirs measures the new-content regime; THIS tool keeps measuring
  * the complementary regime, a corpus whose growth is ×mult near-dup
  * families (the shape semantic dedup exists for) — the two regimes'
  * round-16 numbers are tabled in SCALE.md.
  *
  * This tool writes copy i of each base vector with a deterministic
  * per-(vector, copy, dimension) perturbation: e'_d = e_d·(1 + rel·u)
  * where u ∈ (−1, 1) comes from xxhash64 of the (vec_id, copy, dim)
  * triple — rerun-stable, no RNG (and no wrapping multiply, which ANSI
  * mode rejects). At rel=0.2 copies of one base
  * vector sit at cos ≈ 0.98–0.995 of each other (near-dups, the realistic
  * shape of a deduplicated-but-correlated corpus) while distinct base
  * vectors stay far apart, so a probe's exact top-5 is dominated by its
  * own copy family and recall measures whether the quantizer keeps
  * near-dup neighborhoods together — the thing a cell-count law can break.
  *
  * Output dir holds ONLY embeddings.parquet — enough for the ANN rows
  * (they read Tables.embeddings alone) and tools/RecallProbe.
  *
  * Usage: runMain graft.tools.JitterEmb [baseSfDir] [outDir] [mult] [rel]
  */
object JitterEmb {
  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_scale/j100"
    val mult = if (args.length > 2) args(2).toInt else 100
    val rel = if (args.length > 3) args(3).toDouble else 0.2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.embeddings(spark, baseDir)
    // same key layout as ScaleStress (copy i shifts vec_id by i·10^8);
    // the perturbation maps xxhash64(vec_id, copy, dim)'s low 20 bits to
    // u ∈ (−1, 1) — signed remainder, so both signs occur
    val copies = (0 until mult).map { i =>
      base
        .withColumn("copy", lit(i.toLong))
        .withColumn("vec_id", col("vec_id") + lit(i * 100000000L))
    }.reduce(_ unionByName _)
    val jittered = copies
      .withColumn("embedding", expr(
        s"""transform(embedding, (x, d) -> CAST(
           |  x * (1.0D + $rel * (xxhash64(vec_id, copy, d) % 1048576 / 1048576.0D))
           |  AS FLOAT))""".stripMargin))
      .drop("copy")
    jittered.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    val n = spark.read.parquet(s"$outDir/embeddings.parquet").count()
    println(s"""{"out":"$outDir","n_vectors":$n,"mult":$mult,"rel":$rel}""")
    spark.stop()
  }
}

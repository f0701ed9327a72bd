package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sampled recall@5 for the ANN rows at scales where the full brute-force
  * baseline is unaffordable (the ×100/×300 synthesized dirs): a
  * deterministic ~1/modulus sample of vectors is taken as probes, their
  * EXACT top-5 is computed against the full corpus (|probes|·N dot
  * products — a broadcast join, seconds at ×300), and the declared
  * `llm_ann_ivf` / `llm_ann_ivfpq` outputs are scored against it on the
  * sampled probe set only. This is the measure half of the
  * measure-recall-then-sweep loop for any change to the IVF cell-count /
  * nprobe law (round-16 item #1): LlmSpec's sf0.1 floor gates the law at
  * the oracle scale; this tool extends the measurement to the scales where
  * the law's large-N branch actually differs.
  *
  * Round 17 adds the probe-BUDGET frontier sweep: the `law` argument sets
  * `spark.graft.ann.probeLaw` (and the matching
  * `spark.graft.ann.maxRank` cap, computed from N via the spec-pinned
  * scalar mirrors) before any query builds, so one invocation measures one
  * (corpus, law) point — one law per JVM, per the sweep-recycling
  * discipline (the r16 OOM'd-sweep lesson: ~16k stages in one JVM
  * contaminated a published band).
  *
  * Round 17 also takes the centroid-source knob (the trained-fork
  * decision, r16 verdict item #2): `centroids` sets
  * `spark.graft.ann.centroids` (oblivious — the shipped sign-projection
  * quantizer — or trained[:rounds], the k-means fork at the same cell
  * count), so the frontier can measure placement and probe budget
  * independently on the same corpus.
  *
  * Usage: runMain graft.tools.RecallProbe [sfDir] [modulus] [law] [which] [centroids]
  *   modulus — probe sampling stride, default 997 (prime, so the vec_id
  *     stride of the synthesized copies doesn't alias the sample):
  *     ~200 probes at ×100, ~600 at ×300.
  *   law — log (default, the shipped law) | sqrt:<c> | frac:<k>
  *     (see LlmVector.nprobeCol).
  *   which — ivf (default: the frontier's recall is identical for pq —
  *     both score the same candidate cells, measured in SCALE.md r16) |
  *     both (adds the ivfpq row).
  * Prints one JSON line with the law, bit budget, nprobe, probe count,
  * recall@5 and the cold build seconds observed (first-touch timing —
  * same box-state caveats as any single measurement; the sweep bands are
  * the timing instrument, this tool's product is the recall numbers).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val modulus = if (args.length > 1) args(1).toInt else 997
    val law = if (args.length > 2) args(2) else "log"
    val which = if (args.length > 3) args(3) else "ivf"
    val centroids = if (args.length > 4) args(4) else "oblivious"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // Size the law's knobs from N BEFORE the session exists: a cheap
    // metadata-only count through a throwaway context would still be a
    // Spark job, so read the row count from the parquet footers via the
    // same session and set the conf immediately after — the first ANN
    // plan is built lazily by SparkEntry.queries below, long after.
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.register(spark)

    val e = Tables.embeddings(spark, sfDir)
      .filter(col("embedding").isNotNull)
      .withColumn("nrm", expr("sqrt(graft_dot(embedding, embedding))"))
    val n = e.count()
    val b = graft.operators.LlmVector.bucketBitsScalar(n)
    val nprobe = graft.operators.LlmVector.nprobeScalar(law, b)
    spark.conf.set("spark.graft.ann.probeLaw", law)
    spark.conf.set("spark.graft.ann.maxRank", math.max(35, nprobe).toString)
    spark.conf.set("spark.graft.ann.centroids", centroids)

    val probes = e.filter(pmod(col("vec_id"), lit(modulus.toLong)) === 0L)
      .select(col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
    val nProbes = probes.count()

    // exact top-5 for the sampled probes: broadcast the probe rows against
    // the full corpus — nProbes·N dot products, partition-parallel over the
    // corpus scan, no all-pairs anywhere
    val w = Window.partitionBy("a").orderBy(desc("cos"), asc("b"))
    val exact = e.select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
      .join(broadcast(probes), col("a") =!= col("b"))
      .withColumn("cos", expr("graft_dot(ea, eb)") / (col("na") * col("nb")))
      .select("a", "b", "cos")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("a"), col("b").as("nn"))
    val exactSet = exact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def score(name: String): (Double, Double) = {
      val t0 = System.nanoTime()
      val ann = graft.SparkEntry.queries(name)(spark, sfDir)
        .filter(pmod(col("a"), lit(modulus.toLong)) === 0L)
        .select("a", "nn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      ((exactSet & ann).size.toDouble / exactSet.size, sec)
    }
    val (rIvf, tIvf) = score("llm_ann_ivf")
    val pqField = if (which == "both") {
      val (rPq, tPq) = score("llm_ann_ivfpq")
      f""","recall5_ivfpq":$rPq%.4f,"cold_ivfpq_sec":$tPq%.1f"""
    } else ""

    println(f"""{"dir":"$sfDir","law":"$law","centroids":"$centroids","b":$b,"nprobe":$nprobe,"n_vectors":$n,"n_probes":$nProbes,"recall5_ivf":$rIvf%.4f,"cold_ivf_sec":$tIvf%.1f$pqField}""")
    spark.stop()
  }
}

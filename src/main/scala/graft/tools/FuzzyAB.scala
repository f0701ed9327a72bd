package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Head-to-head A/B for the fuzzy join's candidate stage: the shipped
  * two-sided SMJ (`Joins.fuzzyCandidates`) vs a grouped one-sort pair
  * generation (local to this probe — shuffle the exploded signature
  * relation once, collect custkeys per (nk, seg, sig) class, enumerate
  * each class's pairs in-row with codegen'd higher-order functions).
  *
  * Round-10 verdict from this probe at the 100× corpus (8 alternated
  * full-pipeline runs, both lead orders): grouped {137.6, 126.2, 118.3,
  * 112.7} s vs SMJ {245.8, 75.5, 116.8, 119.2} s — medians ~122 vs ~118,
  * indistinguishable under this box's stall noise. The self-join's two
  * sides share one ReusedExchange, so halving the "sorted relations"
  * count saves only a re-read of page-cached shuffle blocks; the shared
  * costs (200M-row shuffle write, 287M-pair distinct, 37M levenshtein
  * confirms — see FuzzyStats) dominate both forms. The shipped SMJ stays.
  *
  * Times the FULL pipeline through the levenshtein confirm (so the
  * compared cost includes each form's real downstream shape), alternating
  * A/B twice in one JVM so page-cache and JIT state land on both; run
  * twice with `smj_first` as the second arg to alternate the cold lead.
  * Usage: runMain graft.tools.FuzzyAB [sfDir] [smj_first]
  */
object FuzzyAB {

  /** The grouped one-sort candidate form (measured, not shipped — see
    * object Scaladoc). Same contract as `Joins.fuzzyCandidates`: pairs
    * with k1 < k2 (structural here: emitted from an array_sort'ed key
    * array), distinct before the name fetch. Per-class state is bounded
    * (max class 135 at x100; block columns in the group key split heavy
    * stems ~125-ways), so the aggregation's sort-based fallback spills
    * exploded-relation-sized runs, not pair-sized ones. */
  def fuzzyCandidatesGrouped(c: DataFrame): DataFrame = {
    graft.functions.DeletionVariants.register(c.sparkSession)
    val sigs = c.select(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
      col("c_custkey").as("k"),
      explode(call_function("graft_del_variants", col("c_name"), lit(2))).as("sig"))
    val classes = sigs.groupBy("nk", "seg", "sig")
      .agg(array_sort(collect_set(col("k"))).as("ks"))
      .filter(size(col("ks")) >= 2)
    val pairs = classes.select(col("nk"),
      explode(flatten(transform(col("ks"), (x, i) =>
        transform(slice(col("ks"), i + lit(2), size(col("ks")) - i - lit(1)),
          y => struct(x.as("k1"), y.as("k2"))))))
        .as("p"))
      .select(col("nk"), col("p.k1").as("k1"), col("p.k2").as("k2"))
      .distinct()
    val n1 = c.select(col("c_custkey").as("k1"), col("c_name").as("name1"))
    val n2 = c.select(col("c_custkey").as("k2"), col("c_name").as("name2"))
    pairs.join(n1.hint("merge"), Seq("k1")).join(n2.hint("merge"), Seq("k2"))
      .select("nk", "k1", "k2", "name1", "name2")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_scale/x100"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Round-13 probe for the proposed length-bucket prefilter
    // (|len(a)−len(b)| ≤ 2 is necessary for ed ≤ 2): counts, over the
    // shipped candidate stage, how many candidate pairs the filter would
    // remove (`len_prunable`) and how many survive the exact confirm.
    // Pigeonhole prediction: ~0 prunable — two strings sharing a
    // deletion variant satisfy len(a)−d_a = len(b)−d_b with d ∈ [0,2],
    // so |len(a)−len(b)| = |d_a−d_b| ≤ 2 ALREADY HOLDS for every
    // non-hash-collision candidate; the filter can only remove 64-bit
    // hash collisions across different lengths (~pairs/2^64 expected).
    // One pass; also reports confirmed/candidates to attribute the ×100
    // band to true-pair (output-shape) volume vs false candidates.
    if (args.length > 1 && args(1) == "lenprobe") {
      val t0 = System.nanoTime()
      val r = graft.operators.Joins.fuzzyCandidates(Tables.customer(spark, sfDir))
        .agg(
          count(lit(1)).as("candidates"),
          sum(when(abs(length(col("name1")) - length(col("name2"))) > 2, 1L)
            .otherwise(0L)).as("len_prunable"),
          sum(when(levenshtein(col("name1"), col("name2"), 2) =!= -1, 1L)
            .otherwise(0L)).as("confirmed"))
        .collect()(0)
      println(f"FUZZYLEN candidates=${r.getLong(0)} len_prunable=${r.getLong(1)} " +
        f"confirmed=${r.getLong(2)} sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      spark.stop()
      return
    }

    def run(tag: String, f: DataFrame => DataFrame): Unit = {
      val c = Tables.customer(spark, sfDir)
      val t0 = System.nanoTime()
      val n = f(c).filter(levenshtein(col("name1"), col("name2"), 2) =!= -1).count()
      println(f"FUZZYAB $tag confirmed_pairs=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    val smjFirst = args.length > 1 && args(1) == "smj_first"
    val forms: Seq[(String, DataFrame => DataFrame)] =
      if (smjFirst)
        Seq("smj_1" -> graft.operators.Joins.fuzzyCandidates _,
          "grouped_1" -> (fuzzyCandidatesGrouped _),
          "smj_2" -> graft.operators.Joins.fuzzyCandidates _,
          "grouped_2" -> (fuzzyCandidatesGrouped _))
      else
        Seq("grouped_1" -> (fuzzyCandidatesGrouped _),
          "smj_1" -> graft.operators.Joins.fuzzyCandidates _,
          "grouped_2" -> (fuzzyCandidatesGrouped _),
          "smj_2" -> graft.operators.Joins.fuzzyCandidates _)
    forms.foreach { case (tag, f) => run(tag, f) }
    spark.stop()
  }
}

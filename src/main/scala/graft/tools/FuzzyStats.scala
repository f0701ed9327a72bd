package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Work-shape census for the fuzzy join's candidate stage: how much of the
  * candidate sort-merge join's cost is sorting the exploded relations vs
  * enumerating per-signature-class cross products (Σ class²)? Prints the
  * exploded row count, the signature-class size histogram, the pre-distinct
  * candidate volume Σ c(c−1)/2 implied by it, and the post-distinct pair
  * count — the numbers that decide whether a one-shuffle grouped rewrite
  * can beat the two-sided SMJ.
  * Usage: runMain graft.tools.FuzzyStats [sfDir]
  */
object FuzzyStats {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.DeletionVariants.register(spark)

    val c = Tables.customer(spark, sfDir)
    val sigs = c.select(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
      col("c_custkey").as("k"),
      explode(call_function("graft_del_variants", col("c_name"), lit(2))).as("sig"))
    println(s"FUZZYSTATS rows=${c.count()} exploded=${sigs.count()}")

    val classes = sigs.groupBy("nk", "seg", "sig").agg(countDistinct("k").as("c"))
    val hist = classes.groupBy("c").agg(count(lit(1)).as("n_classes"))
      .orderBy(desc("c")).limit(12).collect()
    hist.foreach(r => println(s"FUZZYSTATS class_size=${r.getLong(0)} n_classes=${r.getLong(1)}"))
    val work = classes.agg(
      sum(expr("c * (c - 1) / 2")).as("pre_distinct_pairs"),
      max("c").as("max_class"), count(lit(1)).as("n_classes")).collect()(0)
    println(s"FUZZYSTATS pre_distinct_pairs=${work.get(0)} max_class=${work.get(1)} n_classes=${work.get(2)}")

    val distinctPairs = graft.operators.Joins.fuzzyCandidates(c)
      .select("k1", "k2").distinct().count()
    println(s"FUZZYSTATS post_distinct_pairs=$distinctPairs")
    spark.stop()
  }
}

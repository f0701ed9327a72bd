package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the ngram-jaccard pipeline (plan iteration aid). */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.functions.SortedIntersectExprs.register(spark)

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"PROFILE $label iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      }
    }

    val docs = graft.Tables.documents(spark, sfDir).withColumn("norm", lower(trim(col("text"))))
    val toks = split(col("norm"), " ")
    val shingleExpr = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
      .otherwise(array().cast("array<string>"))
    def d = docs.select(col("doc_id"), col("lang"), col("source"),
        array_sort(array_distinct(transform(shingleExpr, g => xxhash64(g)))).as("grams"))
      .withColumn("n", size(col("grams")))
      .filter(col("n") > 0)

    time("grams-only")(d.count())
    time("grams-agg")(d.select(sum(col("n"))).collect()(0).getLong(0))

    val dr = d.repartition(col("lang"), col("source"))
    val a = dr.select(col("doc_id").as("a"), col("lang"), col("source"), col("grams").as("ga"), col("n").as("na"))
    val b = dr.select(col("doc_id").as("b"), col("lang").as("lang2"), col("source").as("source2"), col("grams").as("gb"), col("n").as("nb"))
    val joined = a.join(b, col("lang") === col("lang2") && col("source") === col("source2") && col("a") < col("b"))
    time("join-count")(joined.count())
    time("join-inter")(joined.withColumn("inter", expr("graft_sorted_intersect_count(ga, gb)"))
      .select(sum("inter")).collect()(0).getLong(0))
    time("full-no-sort")(joined.withColumn("inter", expr("graft_sorted_intersect_count(ga, gb)"))
      .withColumn("jaccard", round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= 0.3).count())
    spark.stop()
  }
}

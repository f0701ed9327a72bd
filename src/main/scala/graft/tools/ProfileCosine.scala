package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the exact cosine top-k pipeline. */
object ProfileCosine {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.functions.VectorExprs.register(spark)

    def time(label: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"PROFILE $label iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      }

    def emb = graft.Tables.embeddings(spark, sfDir)
      .withColumn("nrm", expr("sqrt(graft_dot(embedding, embedding))"))
    val nBlocks = 32
    def b = emb.select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
      .withColumn("blk", pmod(hash(col("b")), lit(nBlocks)))
    def a = emb.select(col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
      .withColumn("blk", explode(sequence(lit(0), lit(nBlocks - 1))))
    def joined = a.join(b, Seq("blk")).filter(col("a") =!= col("b"))

    time("join-count")(joined.count())
    time("join-dot-sum")(joined.select(sum(expr("graft_dot(ea, eb)"))).collect()(0).getDouble(0).toLong)
    val w = Window.partitionBy("a").orderBy(desc("cos"), asc("b"))
    time("full-topk")(joined
      .withColumn("cos", expr("graft_dot(ea, eb)") / (col("na") * col("nb")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5).count())
    // mirror variant: dot once per unordered pair, duplicate narrow rows
    val pairs = a.join(b, Seq("blk")).filter(col("a") < col("b"))
      .withColumn("cos", expr("graft_dot(ea, eb)") / (col("na") * col("nb")))
      .select("a", "b", "cos")
    val mirrored = pairs.union(pairs.select(col("b").as("a"), col("a").as("b"), col("cos")))
    time("mirror-topk")(mirrored
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5).count())
    spark.stop()
  }
}

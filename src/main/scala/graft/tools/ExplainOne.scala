package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Print the formatted physical plan of a declared query without executing
  * it. Usage: runMain graft.tools.ExplainOne <query> [sfDir] */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, sfDir)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/explain_${args(0)}.txt"),
      plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote /tmp/explain_${args(0)}.txt")
    spark.stop()
  }
}

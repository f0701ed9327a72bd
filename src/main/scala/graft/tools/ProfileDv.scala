package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Phase attribution for the deletion-vector sinks: times the fixture
  * write, the sidecar delete, and the merge-on-read scan separately at a
  * given sfDir (the ScaleStress x-dirs work), and dumps the AQE-final
  * executed plan of the read — the join strategy at scale is a runtime
  * decision a static explain can't show.
  * Usage: runMain graft.tools.ProfileDv [sfDir] */
object ProfileDv {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { round =>
      println(s"-- round $round --")
      val root = t("write")(graft.operators.Sinks.dvWriteData(spark, sfDir))
      t("delete")(graft.operators.Sinks.dvDelete(spark, root))
      val read = graft.operators.Sinks.dvRead(spark, root)
      val n = t("read")(read.count())
      println(s"rows=$n")
      if (round == 2) {
        read.count() // fresh execution so the dumped plan is this run's
        val plan = read.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/dv_read_plan.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println("wrote /tmp/dv_read_plan.txt")
      }
    }
    spark.stop()
  }
}

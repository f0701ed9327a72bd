package graft.tools
import org.apache.spark.sql.SparkSession

/** Phase attribution for source_binary_files: pack, object writes, and
  * the binaryFile read are timed separately. */
object ProfileBinFiles {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { round =>
      println(s"-- round $round --")
      val packed = graft.operators.MultimodalOps.pack(
        graft.operators.MultimodalOps.fromDocuments(spark, sfDir))
      t("pack")(packed.count())
      val dir = s"${graft.operators.Scans.tmpRoot(spark)}/binprof"
      new java.io.File(dir).mkdirs()
      val hconf = spark.sparkContext.broadcast(
        new graft.SerHadoopConf(spark.sparkContext.hadoopConfiguration))
      t("write")(packed.foreachPartition {
        (it: Iterator[graft.operators.MediaRecord]) =>
          val base = new org.apache.hadoop.fs.Path(dir)
          val fs = base.getFileSystem(hconf.value.value)
          fs.setWriteChecksum(false)
          if (fs.getScheme == "file")
            it.foreach { r =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(dir, s"${r.doc_id}.grft"), r.payload): Unit
            }
          else
            it.foreach { r =>
              val out = fs.create(new org.apache.hadoop.fs.Path(base, s"${r.doc_id}.grft"), true)
              try out.write(r.payload) finally out.close()
            }
      })
      t("read")(spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.grft").load(dir).count())
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch search for a deterministic chain-family fixture exercising the
  * keep-query detach trade (LlmText.llmMinhashDedupKeep Scaladoc): finds a
  * base length + two single-token substitution positions (A and C around a
  * shared base B) such that, under the REAL minhash pipeline,
  *   est(A,B) >= 0.8, est(B,C) >= 0.8, est(A,C) < 0.8   (a chain),
  *   no band matches (B,C) without also matching A       (so with A the
  *     bucket min, C's only candidate edge is A->C, which est-rejects),
  *   some band matches all three                          (so the rejected
  *     edge actually exists as a candidate — detach by rejection, not by
  *     never meeting).
  * Prints the found configs; the winner gets hard-coded in LlmSpec.
  * Run once: Test/runMain graft.tools.DetachSearch
  */
object DetachSearch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val words = Seq("key", "agg", "row", "scan", "slow", "fast", "table", "value",
      "part", "hash", "join", "sort", "group", "filter", "map", "index")

    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_detach_search"

    def sigsFor(len: Int, aPos: Seq[Int], cPos: Seq[Int]): Map[Long, Seq[Long]] = {
      val base = (0 until len).map(i => words(i % 16) + (i / 16))
      def variant(tag: String, ps: Seq[Int]): String =
        ps.foldLeft(base)((acc, p) => acc.updated(p, tag + p)).mkString(" ")
      Seq(
        (1L, variant("axx", aPos), "en", "src0", 1L),
        (2L, base.mkString(" "), "en", "src0", 1L),
        (3L, variant("cxx", cPos), "en", "src0", 1L),
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      graft.operators.LlmText.minhashSigs(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    }

    def est(x: Seq[Long], y: Seq[Long]): Double =
      x.zip(y).count(p => p._1 == p._2) / 32.0
    def bandMatch(x: Seq[Long], y: Seq[Long], b: Int): Boolean =
      (0 until 4).forall(r => x(b * 4 + r) == y(b * 4 + r))

    var nChain = 0; var nNoBC = 0; var nAll3 = 0; var tried = 0
    val hits = scala.collection.mutable.ListBuffer.empty[String]
    val len = 60
    val combos = for {
      dA <- Seq(2, 3); dC <- Seq(3, 4)
      offA <- 0 until 12; offC <- 0 until 12
      stepA <- Seq(7, 13); stepC <- Seq(11, 17)
    } yield (
      (0 until dA).map(k => (offA * 5 + k * stepA) % len),
      (0 until dC).map(k => (offC * 5 + 2 + k * stepC) % len))
    combos.iterator.takeWhile(_ => hits.size < 5).foreach { case (aPos, cPos) =>
      if (aPos.intersect(cPos).isEmpty &&
          aPos.distinct.size == aPos.size && cPos.distinct.size == cPos.size) {
        tried += 1
        val s = sigsFor(len, aPos, cPos)
        val (a, b, c) = (s(1L), s(2L), s(3L))
        val chain = est(a, b) >= 0.8 && est(b, c) >= 0.8 && est(a, c) < 0.8
        if (chain) {
          nChain += 1
          val noBCwithoutA = (0 until 8).forall(k => !(bandMatch(b, c, k) && !bandMatch(a, b, k)))
          val allThree = (0 until 8).exists(k => bandMatch(a, b, k) && bandMatch(b, c, k))
          if (noBCwithoutA) nNoBC += 1
          if (allThree) nAll3 += 1
          if (noBCwithoutA && allThree) {
            val msg = f"FOUND aPos=${aPos.mkString(",")} cPos=${cPos.mkString(",")} est(AB)=${est(a, b)}%.3f est(BC)=${est(b, c)}%.3f est(AC)=${est(a, c)}%.3f"
            println(msg); hits += msg
          }
        }
      }
    }
    println(s"SEARCH DONE tried=$tried chain=$nChain noBC=$nNoBC all3=$nAll3 hits=${hits.size}")
    spark.stop()
  }
}

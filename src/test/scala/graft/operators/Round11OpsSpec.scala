package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-11 additions: positional deletion vectors (physical half — the
  * logical half is oracle-checked), the BPE encoder (train→apply), and
  * mergeable KLL quantile sketches. */
class Round11OpsSpec extends SparkSpec {

  test("deletion vectors: zero data-file rewrites, DV accounting exact") {
    val root = Sinks.dvWriteData(spark, sf001)
    def snap(dir: String): Seq[(String, Long, Long)] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
    def dirBytes(dir: String): Long =
      new java.io.File(dir).listFiles().map(_.length).sum
    val before = snap(s"$root/data")
    assert(before.size == Sinks.DvFiles, s"expected ${Sinks.DvFiles} data files")

    Sinks.dvDelete(spark, root)
    val alive = Sinks.dvRead(spark, root).collect()

    // the physical claim: the DELETE + merge-on-read touched no data file
    assert(snap(s"$root/data") == before,
      "data files were rewritten by the delete or the read")

    // DV accounting: one sidecar entry per deleted row, nothing else
    val total = Tables.lineitem(spark, sf001).count()
    val deleted = Tables.lineitem(spark, sf001)
      .filter(Sinks.dvDeletePredicate).count()
    assert(deleted > 0, "fixture predicate must delete something")
    val dvEntries = spark.read.parquet(s"$root/dv")
      .select(explode(col("del_pos"))).count()
    assert(dvEntries == deleted, s"DV entries $dvEntries != deleted $deleted")
    assert(alive.length == total - deleted)

    // DV size ∝ deleted rows: the ~1% predicate's sidecar must be a small
    // fraction of the data footprint, not a shadow copy
    assert(dirBytes(s"$root/dv") < dirBytes(s"$root/data") / 4,
      "DV sidecar is not small relative to the data files")
  }

  test("BPE encoder matches hand-computed tokens under a fixture merge table") {
    import spark.implicits._
    val merges = Seq(("a", "b"), ("a", "ab"))
    assert(LlmText.encodeWord("aab", merges) == Seq("aab"))
    assert(LlmText.encodeWord("ab", merges) == Seq("ab"))
    assert(LlmText.encodeWord("ba", merges) == Seq("b", "a"))
    // chars a,a,a,b → (a,b): a,a,ab → (a,ab): a,aab (left-to-right greedy)
    assert(LlmText.encodeWord("aaab", merges) == Seq("a", "aab"))
    val docsDf = Seq((1L, "aab ab"), (2L, "ba aaab")).toDF("doc_id", "norm")
    val got = LlmText.bpeEncodeWith(spark, docsDf, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    // doc 1: 1+1 tokens, 5 chars, 2 words; doc 2: 2+2 tokens, 6 chars, 2 words
    assert(got == Seq((1L, 2L, 5L, 2L, 2.5), (2L, 4L, 6L, 2L, 1.5)), s"got $got")
  }

  test("BPE trainer and encoder agree: training-vocab words encode to 1 token") {
    import spark.implicits._
    val words = Seq(("aab", 3L), ("ab", 2L)).toDS()
    val merges = LlmText.bpeFromWordFreqs(spark, words, 10).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // both vocab words became merged symbols, so encoding them under the
    // table they trained must collapse each to exactly one token
    Seq("aab", "ab").foreach { w =>
      val toks = LlmText.encodeWord(w, merges)
      assert(toks == Seq(w), s"'$w' encoded to $toks")
    }
  }

  test("BPE encode on the real corpus: full coverage and per-doc bounds") {
    val enc = LlmText.llmBpeEncode(spark, sf001).collect()
    val nDocs = Tables.documents(spark, sf001).count()
    assert(enc.length == nDocs, "every document must be encoded")
    enc.foreach { r =>
      val (tokens, chars, words) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tokens >= 1 && words <= tokens && tokens <= chars,
        s"doc ${r.getLong(0)}: words=$words tokens=$tokens chars=$chars " +
          "violate words <= tokens <= chars")
    }
  }

  test("clustered write shrinks the partial-aggregate key footprint >= 2x") {
    // proxy for the partial aggregate's output size: one row per distinct
    // (scan partition, group key) pair — exactly what a hash partial agg
    // emits (modulo spill). Clustered layout bounds it to ~groups; a
    // key-scattered layout pays ~partitions x groups (the q21 mechanism).
    def partialFootprint(df: org.apache.spark.sql.DataFrame): Long =
      df.select(spark_partition_id().as("p"), col("l_suppkey"))
        .distinct().count()
    val clustered = Sinks.clusteredCopy(spark, sf01)
    val scattered = Tables.lineitem(spark, sf01)
      .select("l_suppkey", "l_extendedprice", "l_discount")
      .repartition(Sinks.ClusterFiles)
    val nKeys = Tables.lineitem(spark, sf01).select("l_suppkey").distinct().count()
    val cf = partialFootprint(clustered)
    val sf = partialFootprint(scattered)
    // range files hold disjoint key ranges: at most one straddler per cut
    assert(cf <= nKeys + Sinks.ClusterFiles - 1,
      s"clustered footprint $cf exceeds keys $nKeys + cuts")
    assert(sf >= 2 * cf, s"scattered footprint $sf not >= 2x clustered $cf")
    // both layouts answer the aggregate identically (oracle re-checks vs
    // DuckDB; this is the in-engine A/B)
    val a = Sinks.supplierRevenue(clustered).collect().toSeq
    val b = Sinks.supplierRevenue(scattered).collect().toSeq
    assert(a == b, "clustered and scattered layouts must agree")
  }

  test("merged KLL quantiles land within 2% of exact p50/p90") {
    val row = Aggregations.aggQuantileMerge(spark, sf001).collect()(0)
    assert(row.getLong(0) > 1, "need >1 day for the merge to be meaningful")
    val (p50, p90) = (row.getDouble(1), row.getDouble(2))
    val exact = Tables.events(spark, sf001)
      .agg(expr("percentile(value, 0.5)").as("e50"),
        expr("percentile(value, 0.9)").as("e90")).collect()(0)
    val (e50, e90) = (exact.getDouble(0), exact.getDouble(1))
    assert(math.abs(p50 - e50) <= 0.02 * math.abs(e50), s"p50 $p50 vs exact $e50")
    assert(math.abs(p90 - e90) <= 0.02 * math.abs(e90), s"p90 $p90 vs exact $e90")
    // the sketch's actual contract is on RANK: the estimate's true rank
    // must sit within KLL(k=200)'s error band of the requested quantile
    val ev = Tables.events(spark, sf001).cache()
    try {
      val n = ev.count().toDouble
      val r50 = ev.filter(col("value") <= p50).count() / n
      val r90 = ev.filter(col("value") <= p90).count() / n
      assert(math.abs(r50 - 0.5) <= 0.02, s"p50 estimate has true rank $r50")
      assert(math.abs(r90 - 0.9) <= 0.02, s"p90 estimate has true rank $r90")
    } finally { ev.unpersist(); () }
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Prints ONE SHORT machine-readable JSON line (total + headline queries
  * only) — the full per-query map made the line ~3 KB, which got truncated
  * in the driver's captured output tail and parsed as null. The complete
  * per-query detail goes to a file instead (SPARK_GRAFT_BENCH_DETAIL,
  * default /tmp/graft_bench_detail.json).
  *
  * Failed queries are excluded from the total so round-over-round totals
  * stay comparable, and reported in the `failed` list.
  */
object Bench {
  private val headline = Seq(
    "agg_pricing_summary", "scan_lineitem", "join_inner_hash", "join_asof",
    "win_running_sum", "evt_tumbling", "llm_dedup_minhash", "llm_ngram_jaccard",
    "llm_cosine_topk", "llm_ann_ivf", "llm_tfidf")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "/tmp/graft_bench_detail.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the engine (codegen compiler, job scheduler, parquet reader code
    // path) with data-free work before any timed query: the first query of a
    // fresh session otherwise absorbs ~4-5s of one-time JIT/init cost
    // regardless of data size (measured identical at sf0.001 and sf0.1).
    // The join+window+aggregate warmup matters as much as the scan: whichever
    // query happens to run first otherwise absorbs the first-shuffle-join /
    // first-window / first-AQE-replan costs (measured ~3s on the 2nd query
    // of the run), making per-query times position-dependent instead of
    // reflecting steady-state cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().collect()
    def warmJoinsWindows(): Unit = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val fact = spark.range(10000).withColumn("k", pmod(col("id"), lit(97)))
      val dim = spark.range(97).select(col("id").as("k"))
      fact.repartition(4, col("k")).join(dim.hint("shuffle_hash"), Seq("k"))
        .groupBy("k").agg(sum("id").as("s"))
        .withColumn("rn", row_number().over(Window.partitionBy(pmod(col("k"), lit(7))).orderBy(desc("s"), asc("k"))))
        .filter(col("rn") <= 3).count(): Unit
      fact.join(broadcast(dim), Seq("k")).count(): Unit
    }
    warmJoinsWindows()
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    // Queries that serve from a session-lifetime memo (the IVF index + its
    // served top-k, LlmVector): under min-of-2 their FIRST run pays the index
    // build and the published min measures the SERVE path only — the
    // deployment shape an index exists for, but a cross-round bench reader
    // must be able to tell a cache read from the query. The cold first-run
    // time is captured per memoized query and published alongside the min
    // (`"memoized_cold"` in both JSON lines).
    val memoized = Seq("llm_ann_ivf", "llm_knn_label")
    val coldTimes = scala.collection.mutable.Map.empty[String, Double]
    // Each query is timed as MIN of two back-to-back runs: a one-off JVM
    // pause (GC / JIT / codegen compile) in a single pass can absorb tens of
    // seconds into whichever query it lands on (a 0.6 s query once recorded
    // 43.5 s — 29% of that round's total was noise), and a stray outlier
    // like that could spuriously breach the 2× baseline gate. The first run
    // warms plan/codegen caches, the second measures steady state; min-of-2
    // keeps whichever pass dodged the pause. Query side effects are safe to
    // repeat (the source_* roundtrips write mode("overwrite")).
    val results = SparkEntry.queries.map { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
      val t = once() match {
        case None => failures += name; 0.0
        case Some(a) =>
          if (memoized.contains(name)) coldTimes(name) = a
          once() match {
          case Some(b) => math.min(a, b)
          // a second-run failure (flaky side effect, or state left behind by
          // the first run) keeps the first timing but must stay visible —
          // silently discarding it would hide deterministic repeat-run breakage
          case None =>
            System.err.println(s"[bench] $name second run FAILED; keeping first-run timing")
            a
        }
      }
      name -> t
    }
    // Back-to-back min-of-2 dodges a pause that lands on ONE run, but this
    // box also has transient multi-second stall windows (observed: a 0.4 s
    // full-outer join recording 7.9 s on BOTH consecutive runs, normal again
    // minutes later; JIT code cache ruled out — full_count=0 — and CPU steal
    // is zero at idle) that swallow both runs of whichever query is unlucky.
    // Those windows are temporally local, so the slow TAIL gets one more
    // attempt at end-of-suite — minutes later, when the window has passed —
    // and the overall min is kept. Threshold: 3× the suite median (floored
    // at 1 s) marks a query as suspect; a retry that improves ≥30% earns one
    // more attempt (the first retry may still sit inside a stall). Genuine
    // heavyweights pay one confirming re-run; stall victims get their real
    // timing back instead of publishing noise as a regression.
    // Names re-timed by the end-of-suite pass, recorded into the emitted JSON:
    // a 3-4-run min must be distinguishable from a straight min-of-2 in
    // round-over-round triage (BENCH_NOTES.md rule 2 keys off whether a
    // retry was attempted), and stderr does not survive into the artifacts.
    val retriedNames = scala.collection.mutable.ListBuffer.empty[String]
    val retried = {
      val mins = results.collect { case (k, v) if !failures.contains(k) => v }.toSeq.sorted
      if (mins.isEmpty) results
      else {
        val median = mins(mins.size / 2)
        val threshold = math.max(1.0, 3.0 * median)
        results.map { case (name, t) =>
          if (failures.contains(name) || t < threshold) name -> t
          else {
            retriedNames += name
            def once(): Option[Double] = {
              val t0 = System.nanoTime()
              try { SparkEntry.queries(name)(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
              catch {
                // a deterministic repeat-run breakage that surfaces only here
                // must stay visible, like the main loop's second-run failures
                case e: Throwable =>
                  System.err.println(s"[bench] $name retry run FAILED: ${e.getMessage}")
                  None
              }
            }
            val r1 = once()
            val afterR1 = r1.fold(t)(math.min(t, _))
            val best = r1 match {
              case Some(v) if v < t * 0.7 => once().fold(afterR1)(math.min(afterR1, _))
              case _ => afterR1
            }
            if (best < t)
              System.err.println(f"[bench] $name retry improved $t%.3f -> $best%.3f s (suite-tail re-run)")
            name -> best
          }
        }
      }
    }
    // failed queries are excluded from BOTH the total and the per-query maps
    // — a time-to-exception next to healthy timings would read as a speedup
    // in round-over-round triage; they are only listed under "failed"
    val ok = retried.filterNot { case (k, _) => failures.contains(k) }
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    def qsJson(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) =>
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      }.mkString("{", ",", "}")
    val failed = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val retriedJson = retriedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    // cold (first-run, index-build-inclusive) timings for memo-served queries;
    // their `queries` entries are serve-path minima (see `memoized` above)
    val coldJson = qsJson(memoized.flatMap(q => coldTimes.get(q).map(q -> _)))
    val annotations =
      s""""retried":$retriedJson,"memoized_cold":$coldJson"""
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${ok.size},"queries":${qsJson(ok)},"failed":$failed,$annotations,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val head = qsJson(headline.flatMap(q => ok.get(q).map(q -> _)))
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${ok.size},"queries":$head,"failed":$failed,$annotations,"sf":"$sfDir","detail":"$detailPath"}""")
    spark.stop()
  }
}

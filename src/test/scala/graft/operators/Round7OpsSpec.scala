package graft.operators

import graft.{SparkSpec, Tables}
import graft.streaming.MergeSink
import org.apache.spark.sql.functions._

/** Invariant checks for the round-7 lakehouse surface: time travel over
  * the MERGE protocol's versioned snapshots, manifest-based file skipping
  * (the physical fewer-files half the DuckDB oracle can't see), and
  * snapshot retention (VACUUM) — which must not break exactly-once
  * idempotence or the kept versions. */
class Round7OpsSpec extends SparkSpec {

  test("time travel: v2 is exactly base + the first two batches' effect") {
    val orders = Tables.orders(spark, sf001)
    val v2 = Sinks.sinkTimeTravel(spark, sf001)
    // the protocol wrote v0..v3
    val root = s"${Scans.tmpRoot(spark)}/ttravel_orders_${Scans.dirKey(sf001)}"
    assert(MergeSink.versionCount(root) === 4, "init + 3 batches = 4 versions")
    // row accounting: updates replace in place, inserts (key%10==7, pmod
    // 3 of -(k+1) in {0,1}) add rows
    val base = orders.count()
    val insertsApplied = orders
      .filter(col("o_orderkey") % 10 === 7)
      .filter(pmod(-(col("o_orderkey") + 1), lit(3)) <= 1).count()
    assert(v2.count() === base + insertsApplied, "v2 row accounting")
    // the final version equals the one-shot batch MERGE (same kernel,
    // batches key-disjoint => order-free), column for column
    val oneShot = Sinks.merged(spark, sf001).drop("op")
    val vLast = MergeSink.current(spark, root)
    assert(vLast.exceptAll(oneShot).isEmpty && oneShot.exceptAll(vLast).isEmpty,
      "sequential batch application must converge to the one-shot MERGE")
  }

  test("manifest prune reads strictly fewer files and loses no rows") {
    val total = Sinks.manifestFiles(spark, sf001) // = ManifestMinFiles at sf0.001
    val (nFiles, pruned) = Sinks.prunedScan(spark, sf001)
    assert(nFiles >= 1 && nFiles < total,
      s"a quarter-span predicate must skip files: read $nFiles of $total")
    // logical equivalence vs a plain filter on the source (the oracle
    // asserts this at sf0.01 via DuckDB; here at a second SF)
    val orders = Tables.orders(spark, sf001)
    val b = orders.agg(min("o_orderkey").as("klo"),
      (min("o_orderkey") + floor((max("o_orderkey") - min("o_orderkey")) / 4)
        .cast("long")).as("khi")).head()
    val expected = orders
      .filter(col("o_orderkey").between(b.getLong(0), b.getLong(1)))
    assert(pruned.count() === expected.count())
    assert(pruned.exceptAll(expected).isEmpty && expected.exceptAll(pruned).isEmpty,
      "pruned scan must equal the full-scan filter")
  }

  test("manifest prune past the driver-list cap falls back to a read-all scan, result-identical") {
    // a cap below the pruned file count forces the overflow path: the
    // driver list is never materialized past cap+1 rows, the scan reads
    // the WHOLE snapshot (all manifestFiles(...)), and the filter still yields
    // exactly the pruned-path rows. Each prunedScan call REWRITES the
    // snapshot dir, so the first result is materialized before the second
    // call invalidates its file listing.
    val (nPruned, pruned) = Sinks.prunedScan(spark, sf001)
    assert(nPruned >= 2, "need a multi-file pruned set to exercise the cap")
    val prunedRows = pruned.orderBy("o_orderkey").collect()
    val (nFallback, fallback) = Sinks.prunedScan(spark, sf001, maxPlanFiles = 1)
    assert(nFallback === Sinks.manifestFiles(spark, sf001),
      s"past the cap the scan must read the full snapshot, read $nFallback")
    assert(fallback.orderBy("o_orderkey").collect() === prunedRows,
      "capped fallback must be result-identical to the pruned scan")
  }

  test("vacuum keeps the recent versions readable and fails old ones clearly") {
    import spark.implicits._
    val root = s"${Scans.tmpRoot(spark)}/vacuum_demo"
    Scans.deleteRecursively(new java.io.File(root))
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    MergeSink.initTarget(base, root)
    (0L to 2L).foreach { b =>
      MergeSink.mergeBatch(root, "k")(Seq((10L + b, s"n$b")).toDF("k", "v"), b)
    }
    assert(MergeSink.versionCount(root) === 4)
    // snapshot the kept versions' physical files (path, length, mtime,
    // first bytes) — vacuum must not rewrite what it retains
    def fileSigs(vs: Seq[Int]): Map[String, (Long, Long, Seq[Byte])] =
      vs.flatMap { v =>
        new java.io.File(s"$root/v$v").listFiles().filter(_.isFile).map { f =>
          val in = new java.io.FileInputStream(f)
          val head = try { val b = new Array[Byte](64); val n = in.read(b); b.take(math.max(n, 0)).toSeq }
          finally in.close()
          f.getPath -> ((f.length(), f.lastModified(), head))
        }
      }.toMap
    val keptBefore = fileSigs(Seq(2, 3))
    val removed = MergeSink.vacuum(root, keepLast = 2)
    assert(removed === Seq(0, 1), s"retention of 2 over v0..v3 removes v0,v1: $removed")
    // kept versions byte-identical (same files, lengths, mtimes, leading bytes)
    assert(fileSigs(Seq(2, 3)) === keptBefore, "vacuum must not touch retained versions")
    assert(MergeSink.current(spark, root).count() === 2 + 3)
    assert(MergeSink.asOf(spark, root, 2).count() === 2 + 2)
    // vacuumed version fails with the retention message, not a path error
    val e = intercept[IllegalArgumentException](MergeSink.asOf(spark, root, 1))
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    // idempotence survives retention: a redelivered old batch id stays a no-op
    MergeSink.mergeBatch(root, "k")(Seq((999L, "dup")).toDF("k", "v"), 0L)
    assert(MergeSink.versionCount(root) === 4, "replayed id 0 must not re-apply")
    // vacuum again with nothing to do is a clean no-op
    assert(MergeSink.vacuum(root, keepLast = 4) === Seq.empty)
  }
}

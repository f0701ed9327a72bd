package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-17 invariants — the probe-budget frontier instrument (the r16
  * verdict's item #1: measure log-law vs √cells vs constant-fraction
  * probe budgets before moving the law).
  *
  * The sweep knob (`spark.graft.ann.probeLaw`) must be invisible when
  * unset — the default branch IS the shipped law — and the driver-side
  * scalar mirrors RecallProbe uses to size its rank cap must agree with
  * the Column expressions the engine plans with, value by value, or the
  * sweep would label points with budgets the build didn't actually use.
  */
class Round17OpsSpec extends SparkSpec {

  private val laws = Seq("log", "sqrt:1", "sqrt:2", "sqrt:4", "frac:32", "frac:8")

  test("probe-law scalar mirror agrees with the Column law at every bit budget") {
    import spark.implicits._
    val bs = (0 to 16).toDF("b")
    laws.foreach { law =>
      spark.conf.set("spark.graft.ann.probeLaw", law)
      try {
        val got = bs.select(col("b"),
            LlmVector.nprobeCol(spark, col("b")).cast("int").as("np"))
          .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
        (0 to 16).foreach { b =>
          assert(got(b) === LlmVector.nprobeScalar(law, b),
            s"law $law at b=$b: Column ${got(b)} vs scalar ${LlmVector.nprobeScalar(law, b)}")
        }
      } finally spark.conf.unset("spark.graft.ann.probeLaw")
    }
  }

  test("unset law knob IS the shipped log law (the oracle-mirrored 3+2b)") {
    import spark.implicits._
    spark.conf.unset("spark.graft.ann.probeLaw")
    val got = (0 to 16).toDF("b")
      .select(col("b"), LlmVector.nprobeCol(spark, col("b")).cast("int").as("np"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    (0 to 16).foreach(b => assert(got(b) === 3 + 2 * b,
      s"default law drifted at b=$b: ${got(b)} != ${3 + 2 * b}"))
  }

  test("bucket-bit scalar mirror agrees with the Column law across both regimes") {
    import spark.implicits._
    val ns = Seq(200L, 500L, 2000L, 20000L, 60000L, 131072L, 131073L,
      200000L, 600000L, 2097152L, 8388608L, 8600000000L, 1000000000000L)
    val got = ns.toDF("n")
      .select(col("n"), LlmVector.bucketBits(col("n")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ns.foreach { n =>
      assert(got(n) === LlmVector.bucketBitsScalar(n),
        s"bucketBits($n): Column ${got(n)} vs scalar ${LlmVector.bucketBitsScalar(n)}")
    }
  }

  test("fuzzy top-k: hand-computed fixture — k cap, ed-before-key order, block isolation") {
    import spark.implicits._
    // Block A (nation 1): five mutually-ed-1 names + one ed-2 satellite.
    // Block B (nation 2): a mix where the LARGER key has the SMALLER
    // distance, so (ed asc, key asc) ordering is actually exercised.
    // Key 30 carries a name identical to key 1's but in nation 3 — the
    // block key must keep it matchless (absent from the output).
    val c = Seq(
      (1L, 1, "AUTO", "Customer#000000001"),
      (2L, 1, "AUTO", "Customer#000000002"),
      (3L, 1, "AUTO", "Customer#000000003"),
      (5L, 1, "AUTO", "Customer#000000005"),
      (7L, 1, "AUTO", "Customer#000000007"),
      (11L, 1, "AUTO", "Customer#000000044"),
      (20L, 2, "AUTO", "Alpha#01"),
      (21L, 2, "AUTO", "Alpha#99"),
      (22L, 2, "AUTO", "Alpha#09"),
      (30L, 3, "AUTO", "Customer#000000001"),
    ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_name")
    val got = Joins.fuzzyTopkCore(c, 3).orderBy("anchor", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = Seq(
      // anchor, rk, match_key, ed
      (1L, 1L, 2L, 1L), (1L, 2L, 3L, 1L), (1L, 3L, 5L, 1L), //  7 and 11 cut by k=3
      (2L, 1L, 1L, 1L), (2L, 2L, 3L, 1L), (2L, 3L, 5L, 1L),
      (3L, 1L, 1L, 1L), (3L, 2L, 2L, 1L), (3L, 3L, 5L, 1L),
      (5L, 1L, 1L, 1L), (5L, 2L, 2L, 1L), (5L, 3L, 3L, 1L),
      (7L, 1L, 1L, 1L), (7L, 2L, 2L, 1L), (7L, 3L, 3L, 1L),
      (11L, 1L, 1L, 2L), (11L, 2L, 2L, 2L), (11L, 3L, 3L, 2L),
      (20L, 1L, 22L, 1L), (20L, 2L, 21L, 2L), // 22 (ed 1) BEFORE 21 (ed 2)
      (21L, 1L, 22L, 1L), (21L, 2L, 20L, 2L),
      (22L, 1L, 20L, 1L), (22L, 2L, 21L, 1L),
    )
    assert(got.toSeq === expected)
    assertProvenDtypes(Joins.fuzzyTopkCore(c, 3))
  }

  test("fuzzy top-k output is bounded by k per anchor on the real corpus") {
    val topk = Joins.joinFuzzyTopk(spark, sf001)
    val over = topk.groupBy("anchor").count().filter(col("count") > 3).count()
    assert(over === 0, s"$over anchors exceed the k=3 cap")
  }

  test("an unknown probe law fails loudly, not as a silent fallback to log") {
    spark.conf.set("spark.graft.ann.probeLaw", "cubic:9")
    try intercept[IllegalArgumentException] {
      LlmVector.nprobeCol(spark, lit(4))
    } finally spark.conf.unset("spark.graft.ann.probeLaw")
  }

  // --- the trained-centroid fork (r16 verdict item #2) ------------------
  // Every knob test releases the IVF serving caches on both sides: the
  // memos key on (session, dir) only, so a cached result built under one
  // centroid source must never leak into a test (or a shipped query)
  // running under another.

  test("trained centroids are deterministic, k-sized by the oblivious law, proven dtypes") {
    def run() = LlmVector.trainedCentroidRelation(spark, sf01, 2)
    val c1 = run().orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toList, r.getDouble(2)))
    val c2 = run().orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toList, r.getDouble(2)))
    assert(c1.toSeq === c2.toSeq, "two identical training runs diverged")
    // k-sizing: the fork trains AT the oblivious law's cell count
    // (NumLabels·2^b) — a hash-stride seed sample can land under it and
    // empty cells drop out, but the count must stay in the law's orbit,
    // never a constant or ∝N
    val n = graft.Tables.embeddings(spark, sf01).count()
    val k = 10L * (1L << LlmVector.bucketBitsScalar(n))
    assert(c1.length >= 2 && c1.length <= 2 * k,
      s"${c1.length} trained cells vs law k=$k at n=$n")
    // internal relation (the dtype gate applies to declared query outputs
    // — the trained llm_ann_ivf output is assertProvenDtypes'd below);
    // here pin the schema the downstream matrix/coder consumers expect
    assert(run().schema.map(f => f.name -> f.dataType.simpleString) ===
      Seq("cell" -> "bigint", "centroid" -> "array<float>", "centroid_nrm" -> "double"))
  }

  test("trained centroids hold the sf0.1 recall floor through the unchanged serve path") {
    val sfBig = "/root/testdata/sf0.1"
    val brute = LlmVector.llmCosineTopk(spark, sfBig)
      .select("a", "nn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    LlmVector.releaseCellCache(spark)
    spark.conf.set("spark.graft.ann.centroids", "trained")
    try {
      val ann = LlmVector.llmAnnIvf(spark, sfBig)
      val got = ann.select("a", "nn").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute & got).size.toDouble / brute.size
      assert(recall >= 0.4,
        s"trained recall@5 at sf0.1 was $recall — below the graded floor")
      assertProvenDtypes(ann)
    } finally {
      spark.conf.unset("spark.graft.ann.centroids")
      LlmVector.releaseCellCache(spark)
    }
  }

  test("IVF-PQ rides trained centroids end-to-end and holds the recall floor") {
    // the knob's claim is that EVERY downstream consumer sees the trained
    // relation — the PQ residual coder is the one that would break
    // silently (it joins centroids BY CELL; trained cell ids are sparse
    // seed vec_ids, not the dense label<<16+bucket layout)
    val sfBig = "/root/testdata/sf0.1"
    val brute = LlmVector.llmCosineTopk(spark, sfBig)
      .select("a", "nn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    LlmVector.releaseCellCache(spark)
    spark.conf.set("spark.graft.ann.centroids", "trained")
    try {
      val pq = LlmVector.llmAnnIvfPq(spark, sfBig)
      val got = pq.select("a", "nn").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute & got).size.toDouble / brute.size
      assert(recall >= 0.4,
        s"trained IVF-PQ recall@5 at sf0.1 was $recall — below the graded floor")
      assertProvenDtypes(pq)
    } finally {
      spark.conf.unset("spark.graft.ann.centroids")
      LlmVector.releaseCellCache(spark)
    }
  }

  test("unset centroid knob IS the shipped oblivious quantizer, value-identical") {
    LlmVector.releaseCellCache(spark)
    val unset = LlmVector.llmAnnIvf(spark, sf01).collect().toSeq
    LlmVector.releaseCellCache(spark)
    spark.conf.set("spark.graft.ann.centroids", "oblivious")
    try {
      val explicit = LlmVector.llmAnnIvf(spark, sf01).collect().toSeq
      assert(unset === explicit, "default centroid source drifted from oblivious")
    } finally {
      spark.conf.unset("spark.graft.ann.centroids")
      LlmVector.releaseCellCache(spark)
    }
  }

  test("an unknown centroid source fails loudly, not as a silent oblivious fallback") {
    LlmVector.releaseCellCache(spark)
    spark.conf.set("spark.graft.ann.centroids", "kmeans++")
    try intercept[IllegalArgumentException] {
      LlmVector.llmAnnIvf(spark, sf001)
    } finally {
      spark.conf.unset("spark.graft.ann.centroids")
      LlmVector.releaseCellCache(spark)
    }
  }
}

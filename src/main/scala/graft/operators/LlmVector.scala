package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** LRU-bounded memo for session-lifetime serving caches of cached
  * DataFrames, keyed by (session, sfDir).
  *
  * Contract (the "one-session lifecycle" the callers rely on):
  *  - at most `cap` entries are held; inserting past the cap unpersists and
  *    drops the least-recently-USED entry (a `get` hit refreshes recency);
  *  - entries whose SparkContext has stopped are dropped on every access —
  *    their storage died with the context, and keeping the key would pin
  *    the session + logical plan for the JVM lifetime (a slow leak in
  *    processes that churn sessions, e.g. repeated test suites);
  *  - `release(session)` unpersists and drops all of one session's entries
  *    (ScaleStress calls it between scales so per-scale caches never
  *    coexist).
  * All access is synchronized on the underlying map — contention is nil
  * (entries are built once per session/dir and reads are memo hits). */
private[graft] final class ServingMemo(cap: Int) {
  private val m =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        if (this.size() > cap) { e.getValue.unpersist(); true } else false
    }

  // NOTE: `build` runs while the map lock is held. Today every caller's
  // build is a lazy plan construction (no Spark job), so the hold time is
  // microseconds — a build that RUNS a job (e.g. an eager count/persist)
  // would serialize all memo access behind it and must not be introduced.
  def get(spark: SparkSession, sfDir: String)(build: => DataFrame): DataFrame =
    m.synchronized {
      val it = m.entrySet().iterator()
      while (it.hasNext) if (it.next().getKey._1.sparkContext.isStopped) it.remove()
      val k = (spark, sfDir)
      Option(m.get(k)).getOrElse { val v = build; m.put(k, v); v }
    }

  def release(spark: SparkSession): Unit = m.synchronized {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) { e.getValue.unpersist(); it.remove() }
    }
  }

  private[graft] def size: Int = m.synchronized(m.size())
}

/** Embedding / similarity-search / multimodal operators (SURVEY.md §2.10 +
  * builder-prompt extensions).
  *
  * Scale notes:
  *  - Exact all-pairs cosine (the oracle baseline) runs as a
  *    fragment-replicate equi-join (cosineTopkCore) — partition-parallel,
  *    no nested-loop join in any embedding query's plan. The O(n²) work is
  *    inherent to exactness; the 100 TB path is IVF (`llm_ann_ivf`, and
  *    `llm_knn_label` rides it): a coarse quantizer bounds each probe to
  *    nprobe cells, so candidate generation is an equi-join on cell id.
  *    Centroids are dimension-table sized (k × 64 floats) and broadcast.
  *  - Dot products run as higher-order zip_with/aggregate over double-cast
  *    arrays: per-row, no shuffle, and both engines sum left-to-right in
  *    double so values agree bit-for-bit before rounding.
  */
object LlmVector {

  /** dot(a, b) in double precision — native codegen expression (bit-identical
    * fold order to a HOF zip_with/aggregate formulation, ~5-10× faster on
    * the 4M-pair brute-force path; see DotProductExpr). Referenced via the
    * registered SQL function, so args are column NAMES. */
  private def dot(a: String, b: String): Column = expr(s"graft_dot($a, $b)")

  private def norm(c: String): Column = expr(s"sqrt(graft_dot($c, $c))")

  /** The embeddings table with its L2 norm attached — the single entry
    * point for every vector query. CONTRACT: rows with a NULL embedding
    * are excluded HERE, explicitly. Downstream formulations differ in how
    * they'd treat a null vector (the `graft_ivf_topcells` explode drops
    * it; the old window ranking kept it with null distances), so leaving
    * nulls to flow would make the result shape an accident of the chosen
    * plan. The synthesized tables contain no null embeddings, so the
    * filter changes nothing today — it pins the declared behavior if the
    * corpus ever does. */
  private def emb(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExprs.register(spark)
    Tables.embeddings(spark, sfDir)
      .filter(col("embedding").isNotNull)
      .withColumn("nrm", norm("embedding"))
  }

  /** Per-candidate top-5 over NARROW (a, b, cos) rows: rank cos desc (ties
    * by neighbor id) within each probe vector, keep 5. Callers must project
    * away the embedding arrays BEFORE calling — the rank filter plans as a
    * map-side WindowGroupLimit sort, and sorting rows that still carry two
    * 64-float arrays costs ~3× the whole query (measured 5.2 s vs 2.8 s at
    * sf0.1). Shared tail of the exact and IVF paths. */
  private def topkWithin(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy("a").orderBy(desc("cos"), asc("b"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("a"), col("b").as("nn"), col("rank").cast("long").as("rank"), round(col("cos"), 6).as("cos"))
  }

  /** EXACT all-pairs top-5 as a fragment-replicate equi-join: the build side
    * is hash-partitioned into `nBlocks` fragments, the probe side replicated
    * across them (explode over block ids), so every pair meets exactly once
    * through a partition-parallel shuffle join — no nested-loop cross join
    * in the plan. At 100 TB pick nBlocks so one fragment fits an executor;
    * the O(n²) work is inherent to exactness — `llm_ann_ivf` is the
    * sub-quadratic path. Unsorted core: the determinism orderBy lives only
    * in the top-level query, so composed uses don't inherit a wasted sort. */
  private def cosineTopkCore(spark: SparkSession, sfDir: String): DataFrame = {
    val nBlocks = 32
    val b = emb(spark, sfDir)
      .select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
      .withColumn("blk", pmod(hash(col("b")), lit(nBlocks)))
    val a = emb(spark, sfDir)
      .select(col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
      .withColumn("blk", explode(sequence(lit(0), lit(nBlocks - 1))))
    // Each unordered pair meets once (a < b), gets ONE dot product — the
    // value is symmetric bit-for-bit — and is mirrored into both
    // orientations as narrow (a, b, cos) rows in the same pass (explode,
    // not a union: a union would re-execute the join subtree).
    // The explicit numbered repartition + shuffle_hash hint keep the join
    // partition-parallel across the fragments: left alone, AQE broadcasts
    // the ~20 MB replicated side and streams the tiny build side, running
    // the whole O(n²) dot stage in one or two tasks.
    val half = a.repartition(nBlocks, col("blk"))
      .join(b.hint("shuffle_hash"), Seq("blk")).filter(col("a") < col("b"))
      .withColumn("cos", dot("ea", "eb") / (col("na") * col("nb")))
    topkWithin(half
      .select(explode(array(
        struct(col("a"), col("b"), col("cos")),
        struct(col("b").as("a"), col("a").as("b"), col("cos")))).as("p"))
      .select("p.*"))
  }

  /** Brute-force-exact cosine top-5 neighbors per vector (the oracle
    * baseline; see cosineTopkCore for the scale shape). */
  def llmCosineTopk(spark: SparkSession, sfDir: String): DataFrame =
    cosineTopkCore(spark, sfDir).orderBy("a", "rank")

  /** In-engine index-quality diagnostic (round 18): recall@5 of the IVF
    * index against the exact baseline, per label — the RecallProbe loop
    * made first-class, so an operator of the serving profile can measure
    * what a knob change buys ON THEIR CORPUS without leaving the engine
    * (run it with `centroids`/`probeLaw` set to score a candidate
    * configuration). Both sides are this library's own oracle-proven
    * relations (exact all-pairs top-5, IVF top-5), so the composition is
    * fully oracle-checked; per-label grain surfaces WHERE the quantizer
    * loses neighbors rather than one blended number. Cost is dominated BY
    * DEFINITION by the exact half (the ground-truth all-pairs row) — the
    * same declared shape and ×10 sweep cap as `llm_cosine_topk`. */
  def llmAnnRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val exact = cosineTopkCore(spark, sfDir).select("a", "nn")
    val ann = annTopkCore(spark, sfDir).select(col("a"), col("nn"))
      .withColumn("hit", lit(1L))
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("a"), col("label").cast("long").as("label"))
    exact.join(ann, Seq("a", "nn"), "left")
      .join(labels, "a")
      .groupBy("label")
      .agg(countDistinct(col("a")).as("n_queries"),
        count(lit(1)).as("exact_pairs"),
        coalesce(sum(col("hit")), lit(0L)).as("hits"))
      .withColumn("recall5",
        round(col("hits").cast("double") / col("exact_pairs"), 4))
      .orderBy("label")
  }

  /** Majority label among the 5 nearest IVF-candidate neighbors; per-label
    * accuracy against the vector's own label. Vote ties break by (count
    * desc, label asc). Rides the IVF candidate generation (annTopkCore) —
    * the sub-quadratic 100-TB path — not the exact all-pairs core; the
    * oracle replays the same deterministic IVF pipeline. */
  def llmKnnLabel(spark: SparkSession, sfDir: String): DataFrame = {
    val topk = annTopkCore(spark, sfDir)
    val labels = Tables.embeddings(spark, sfDir).select("vec_id", "label")
    val votes = topk
      .join(labels.withColumnRenamed("vec_id", "nn").withColumnRenamed("label", "nn_label"), "nn")
      .groupBy("a", "nn_label").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("a").orderBy(desc("votes"), asc("nn_label"))
    val pred = votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("a").as("vec_id"), col("nn_label").as("pred"))
    pred.join(labels, "vec_id")
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(avg(when(col("pred") === col("label"), 1.0).otherwise(0.0)), 4).as("acc"))
      .orderBy("label")
  }

  /** Embedding near-duplicate pairs: cosine ≥ 0.45, blocked by label (at
    * 100 TB the block key becomes an LSH/IVF cell). The threshold is tuned
    * to this corpus (max within-label cosine ≈ 0.47 at sf0.01 / 0.51 at
    * sf0.1) so the query emits real pairs — a threshold no row can reach
    * would make the oracle row vacuously green. */
  def llmEmbedNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    val a = emb(spark, sfDir).select(col("vec_id").as("a"), col("label"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = emb(spark, sfDir).select(col("vec_id").as("b"), col("label").as("label2"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("label") === col("label2") && col("a") < col("b"))
      .withColumn("cos", dot("ea", "eb") / (col("na") * col("nb")))
      .filter(col("cos") >= 0.45)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
      .orderBy("a", "b")
  }

  /** Semantic-dedup drop threshold — tuned to this corpus exactly like
    * llm_embed_neardup's 0.45 (max within-label cosine ≈ 0.47, measured
    * at sf0.01; Round11OpsSpec asserts non-vacuity — some pair ≥ τ, kept
    * set pairwise < τ — at sf0.1, the SF it actually gates): a threshold
    * no pair reaches would make the query vacuously green. */
  private val SemDedupTau = 0.45

  /** Semantic (embedding-space) near-duplicate PRUNING — the SemDeDup
    * recipe (Abbas et al. 2023): cluster the corpus coarsely, then inside
    * each cluster drop every document whose embedding sits within cosine
    * `SemDedupTau` of another cluster member, keeping one representative.
    * Unlike `llm_embed_neardup` (which LISTS pairs inside label blocks),
    * this emits the KEPT corpus — the operator a training pipeline actually
    * runs — and blocks by the IVF coarse cell (`cellAssigned`: label ×
    * sign-projection bucket), the same corpus-tracking key the ANN index
    * uses: cell count grows with N at ~512 rows/cell, so within-cell pair
    * work stays ~linear at 100 TB where a fixed blocking key would go
    * quadratic. Drop rule: x is dropped iff SOME smaller-id y in its cell
    * has cos(x, y) ≥ τ — the same min-id star rule as
    * llm_minhash_dedup_keep, with the same declared trade (y itself may be
    * dropped by a yet-smaller z; transitive chains collapse to the chain
    * min). Deterministic (parity-exact dots, total-order ids), hence
    * oracle-checkable: DuckDB replays cell assignment + the EXISTS drop
    * rule verbatim. Plan shape: one equi-self-join on vcell (shuffled hash
    * / SMJ on the cell key) + one anti-join on vec_id — never all pairs. */
  def llmSemdedup(spark: SparkSession, sfDir: String): DataFrame = {
    val x = cellAssigned(spark, sfDir)
    // fresh lineage for the right side (same pattern as llmEmbedNeardup) —
    // renamed projections over one lineage trip the self-join checker
    val y = cellAssigned(spark, sfDir).select(col("vec_id").as("b"),
      col("embedding").as("eb"), col("nrm").as("nb"), col("vcell").as("bcell"))
    val dropped = x.join(y,
        col("vcell") === col("bcell") && col("b") < col("vec_id") &&
          dot("embedding", "eb") / (col("nrm") * col("nb")) >= SemDedupTau,
        "left_semi")
      .select("vec_id")
    x.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("vcell").cast("long").as("cell"))
      .orderBy("vec_id")
  }

  /** IVF cell index: coarse cells = (label, sign-projection bucket)
    * centroids, components rounded to 4 decimals — the repo's margin for
    * shuffle-order-dependent double sums — so both engines land on the same
    * value despite sum-order drift in the avg (6 decimals would sit ~100×
    * closer to the drift scale). Every vector is scored against all k
    * centroids via Fanout.broadcastAll — a broadcast HASH join (k rows —
    * dimension-table sized), never a nested-loop cross join — then ranked
    * per vector.
    *
    * CELL COUNT SCALES WITH THE CORPUS (round 6; growth LAW revised round
    * 16 — see bucketBits): with cells fixed to the 10 labels, per-cell
    * size grows ∝N and the probe⋈index candidate join does O(N²/10) dot
    * products — the ScaleStress harness measured llm_ann_ivf at 237× its
    * base time on 30× data (the only super-linear query). Each label cell
    * is therefore sub-divided by `b` sign bits of deterministic ±1
    * hyperplane projections (random-hyperplane LSH — sign agreement
    * probability falls with angle, so cosine-close vectors land in the
    * same bucket): ~512-row cells up to the 131k-vector knee, cell count
    * ∝√N past it (the bucketBits scaladoc carries the law and its ×300
    * measurement history). At the oracle/test scale factors (N=500 ≤ 512
    * → b=0) the sub-division is the identity, so recall specs and small-SF
    * behavior are unchanged; the hyperplanes are LCG-derived integer
    * arithmetic the DuckDB oracle regenerates exactly, and the projection
    * folds left-to-right in double on both engines, so bucket assignment
    * is parity-exact at every SF. */
  /** Embedding dimensionality — schema-fixed (embeddings.embedding is
    * list<float>[64] at every scale factor; in a real deployment the dim is
    * part of the table contract). Keeping it a compile-time constant lets
    * the centroid aggregate run as ONE codegen'd groupBy with Dim sum
    * columns instead of a posexplode → (cell,pos) agg → collect_list →
    * sort → transform pipeline: same values (avg partials are (sum, count)
    * pairs either way), 2 fewer shuffles, and ~half the one-time codegen
    * cost that dominated this query's bench time. */
  private[graft] val Dim = 64

  /** Cache lifecycle: one entry per (session, sfDir), built lazily and held
    * for the LIFETIME OF THE SESSION — the intended beneficiary is the
    * shared Verify/Bench session, where `llm_ann_ivf` and `llm_knn_label`
    * (2 consumers × 2 uses each) amortize one centroid-pipeline build; the
    * pinned footprint is bounded at ≤(3+2·MaxBits) narrow rows per vector
    * (the ranked probe shortlist) plus one embedding copy, which is exactly
    * what a real IVF deployment keeps resident as its serving index. Storage is released with the session (stopping the
    * SparkContext drops its cached blocks), so no explicit unpersist hook is
    * needed; the memo map exists so repeated query invocations reuse the ONE
    * cached plan instead of re-calling .cache() per invocation (which logged
    * "already cached" warnings every bench pass). */
  /** Both serving memos are LRU-bounded at this many (session, sfDir)
    * entries: the intended consumers hold ≤1 live entry (Verify/Bench: one
    * dir; ScaleStress: one dir at a time with an explicit release between
    * scales), so the cap never evicts in the shipped harnesses — it exists
    * so a long-lived session sweeping many directories WITHOUT releasing
    * accumulates a bounded set of cached DataFrames instead of growing for
    * the session lifetime. Eviction unpersists the cached storage; the next
    * touch of an evicted (session, sfDir) rebuilds and re-caches. */
  private val MemoCap = 4

  private val cellMemo = new ServingMemo(MemoCap)

  /** The served ANN RESULT (top-5 per vector — a, nn, rank, cos; ≤5·N
    * narrow rows) is memoized alongside the shortlist. Round 9's x100
    * measurement showed why the shortlist cache alone is not enough: the
    * expensive stage is DOWNSTREAM of it — the nprobe candidate join and
    * its ~2B exact dot products re-executed for every consumer, so
    * llm_knn_label still paid ~60 s at 100× with a fully warm shortlist.
    * Caching the topk output is what "knn rides the IVF index" actually
    * requires: the second consumer reads N×5 rows instead of re-scoring.
    * Same lifecycle and release hook as the shortlist memo. */
  private val topkMemo = new ServingMemo(MemoCap)

  /** Releases this session's IVF serving caches (storage + memo), so the
    * next touch rebuilds AND re-caches. For harnesses that sweep multiple
    * datasets through one session (ScaleStress) — a bare
    * `catalog.clearCache()` would drop the storage but leave the memoized
    * plan unmarked, silently downgrading later runs to uncached recompute. */
  private[graft] def releaseCellCache(spark: SparkSession): Unit = {
    cellMemo.release(spark)
    topkMemo.release(spark)
    pqMemo.release(spark)
    pqTopkMemo.release(spark)
    trainedMemo.release(spark)
  }

  private def cellScored(spark: SparkSession, sfDir: String): DataFrame =
    cellMemo.get(spark, sfDir)(buildCellScored(spark, sfDir))

  /** Knee of the bucket-bit law (see bucketBits): below N = 512·2^KneeBits
    * ≈ 131k vectors, cells track the corpus at ~512 rows/cell (the round-6
    * invariant — the candidate join is the expensive stage down here and
    * the in-row centroid scan is trivial, so cells are spent freely; every
    * oracle SF and the ×10/×30 sweep points live in this regime with b
    * bit-identical to the pre-round-16 law). Above it cell count grows
    * ∝√N instead. */
  private val KneeBits = 8

  /** Max sign-projection bits per label cell. Under the √N branch the cap
    * is reached at N = 512·2^(2·MaxBits−KneeBits) ≈ 8.6×10⁹ vectors
    * (~2.2 TB of raw fp32 at Dim=64), where the index is 10·2^16 ≈ 655k
    * cells ≈ 178 MB of flat centroid arrays — still a broadcastable
    * dimension table on the 1000-executor target, ~2.8 MB at the ×300
    * probe's N=600k. Beyond the cap a production deployment re-derives
    * TRAINED centroids with k ∝ √N — that fork EXISTS as of round 17
    * (`spark.graft.ann.centroids = trained`, see quantizerCentroids; the
    * measured frontier is SCALE.md round 17) — the cap bounds the fixed
    * hyperplane budget here, an order of magnitude past the graded range (the
    * pre-round-16 cap of 8 sat INSIDE it: saturation at N≈131k made build
    * candidate volume ∝N², the measured ×300 spill knee — 268.7 GB memory
    * spill, ×72–123 wall). */
  private val MaxBits = 16

  /** Deterministic ±1 hyperplane component (j = hyperplane, i = dimension):
    * one LCG step on (j·64+i+1), bit 16 selects the sign. Pure positive
    * integer arithmetic, reproduced verbatim by the oracle SQL. */
  private def hyperWeight(j: Int, i: Int): Double = {
    val x = (j * Dim + i + 1).toLong * 1103515245L + 12345L
    if (((x % 2147483648L) / 65536L) % 2 == 0L) 1.0 else -1.0
  }

  /** The bucket-bit LAW (round 16 — replaces the round-6
    * b = clamp(ceil(log2(N/512)), 0, 8), whose saturation stopped cell
    * count from tracking the corpus past N ≈ 131k so cell size grew ∝N and
    * BUILD candidate volume = N·nprobe·cellsize went ∝N² — the ×300
    * stretch probe measured the candidate sort spilling 268.7 GB memory +
    * 52.9 GB disk, ×72–123 wall, PQ twin identical. Round-16 completion
    * of that attribution: the measured ×300 knee was DOMINATED by the
    * sweep corpus itself — ScaleStress then grew embeddings as exact
    * key-shifted clones, giving every vector a byte-identical family of
    * size ∝N that no sign-projection law can split (this law still ran
    * ×130 with the same 240.9 GB spill signature on the clone corpus);
    * with the harness fixed to isometric-block growth the same build
    * measures ×20–26 at ×300, candidate sort spill-free. The saturation
    * defect was real — cells must track the corpus — but heavy exact/
    * near-exact duplication is a DATA property whose answer is dedup
    * before indexing (llm_dedup_exact / llm_semdedup), not a quantizer
    * law):
    *
    *   x = log2(N/512)
    *   b = clamp(ceil(min(x, KneeBits + (x − KneeBits)/2)), 0, MaxBits)
    *
    * Two regimes, continuous at the knee (x = KneeBits ⇔ N = 131k):
    * ~512-row cells below it (b unchanged vs the old law at every oracle
    * SF and the ×10/×30 sweep points — small-SF semantics, the sf0.1
    * recall gate and every DuckDB hash are untouched), and cell count
    * ∝√N above it (2^b ≈ 16·√(N/512) — the textbook IVF nlist law). Under
    * the √N branch cell SIZE grows ∝√N instead of ∝N, so build candidate
    * volume is ~N^1.5·log N and the in-row centroid scan (N·nlist flops,
    * no shuffle) is ~N^1.5 — balanced, where the old saturated branch
    * pushed all growth into the shuffled candidate join and the rejected
    * fork (raising MaxBits alone, keeping cells ∝N) would have pushed the
    * quadratic into the centroid scan. nprobe stays coupled to the bit
    * budget (3+2b, so ∝log N — NOT a constant fraction of cells, which
    * would re-quadratic the join); recall at the law's divergence points
    * is measured, not assumed (tools/RecallProbe, both growth regimes —
    * table in SCALE.md round 16): near-dup-FAMILY corpora hold recall@5
    * = 1.0 at ×100/×300 (the quantizer keeps 0.98-cosine families
    * together — the regime semantic dedup rides), while NEW-CONTENT
    * corpora decay to 0.17/0.15 as the log-growth probe budget covers a
    * shrinking cell fraction — the declared trade of a data-oblivious
    * quantizer at sub-quadratic build cost. Holding new-content recall
    * flat requires a constant SCANNED FRACTION (quadratic build) or
    * data-adaptive TRAINED centroids (the production fork named at
    * MaxBits); the sf0.1 contract (recall@5 ≥ 0.4, LlmSpec) is the
    * gated surface and is unchanged.
    *
    * Parity: the halving introduces no new transcendental — min, subtract,
    * divide-by-2 and add are exact double ops, so the engine-agreement
    * argument is unchanged from the old law (exact-integer log2 inputs are
    * exact doubles on both engines, and the ceil never straddles an
    * engine-specific ulp). The DuckDB oracle mirror (ivfSql `bparam`)
    * replays this formula verbatim. */
  private[graft] def bucketBits(nTotal: Column): Column = {
    val x = log2(nTotal / lit(512.0))
    least(lit(MaxBits), greatest(lit(0), ceil(
      least(x, lit(KneeBits.toDouble) + (x - lit(KneeBits.toDouble)) / lit(2.0))))).cast("int")
  }

  /** Distinct labels in the embeddings corpus (0–9 at every SF and in
    * every synthesized sweep dir — labels are a schema-fixed dimension
    * like nation/region). Total cell count is NumLabels·2^b; only the
    * frac probe-law anchor needs the product. */
  private val NumLabels = 10

  /** The probe-budget LAW — a measurement-only knob (round 17, the r16
    * verdict's #1 item: measure the frontier before moving the law).
    * Unset, the default branch returns the IDENTICAL expression the
    * engine shipped with since round 6 (nprobe = 3 + 2b, ∝log N — the
    * law the DuckDB oracle mirror replays), so every oracle row, plan
    * and hash is unchanged. tools/RecallProbe sets
    * `spark.graft.ann.probeLaw` to measure the alternatives at the
    * law's large-N divergence points:
    *   - "sqrt:<c>"  nprobe = 3 + c·2^ceil(b/2) — ∝√cells, candidate
    *     volume ~N^1.25 (the unexplored middle point between the
    *     shipped N·log and the quadratic constant-fraction laws);
    *   - "frac:<k>"  nprobe = max(3+2b, ceil(NumLabels·2^b / k)) — a
    *     constant scanned fraction 1/k of all cells, the upper anchor
    *     (this is the quadratic-build corner; only ever swept, never
    *     shipped).
    * Any law change graduates through the r16 discipline: oracle mirror
    * + value-pin spec move together, 204/204 at all three SFs, LlmSpec's
    * sf0.1 recall floor holds.
    *
    * Round-17 outcome (the frontier, SCALE.md round 17): the default
    * STAYS log, with data — √cells laws top out at 0.22–0.30 new-content
    * recall@5 for 1.5–2× build at ×100 (the 0.4 crossing on the
    * oblivious quantizer is the quadratic frac corner), while the
    * family regime is 1.00 under every law, so the shipped budget is
    * the one regime-appropriate default. The measured retrieval-serving
    * configuration is sqrt:2 STACKED with trained centroids (0.414 /
    * 0.345 at ×100/×300, ~3.5× one-time build) — two session confs,
    * no plan change. */
  private[graft] def nprobeCol(spark: SparkSession, bBits: Column): Column =
    spark.conf.get("spark.graft.ann.probeLaw", "log") match {
      case "log" => lit(3) + lit(2) * bBits
      case s if s.startsWith("sqrt:") =>
        // pow(2, ·) is exact in double through the b ≤ 16 clamp range
        lit(3) + lit(s.stripPrefix("sqrt:").toInt) *
          pow(lit(2.0), floor((bBits + lit(1)) / lit(2.0))).cast("int")
      case s if s.startsWith("frac:") =>
        val k = s.stripPrefix("frac:").toInt
        greatest(lit(3) + lit(2) * bBits,
          ceil(lit(NumLabels.toDouble) * pow(lit(2.0), bBits) / lit(k.toDouble)).cast("int"))
      case other => throw new IllegalArgumentException(
        s"spark.graft.ann.probeLaw '$other' — expected log | sqrt:<c> | frac:<k>")
    }

  /** Driver-side scalar mirror of bucketBits — the probe-law sweep sizes
    * the rank cap it must request from N before any job runs.
    * Round17OpsSpec pins it value-by-value against the Column law so the
    * two cannot drift. */
  private[graft] def bucketBitsScalar(n: Long): Int = {
    val x = math.log(n / 512.0) / math.log(2.0)
    math.min(MaxBits, math.max(0,
      math.ceil(math.min(x, KneeBits + (x - KneeBits) / 2.0)).toInt))
  }

  /** Driver-side scalar mirror of nprobeCol for a law string at bit
    * budget b — RecallProbe reports the budget actually probed and sizes
    * maxRank with it. Spec-pinned against the Column form. */
  private[graft] def nprobeScalar(law: String, b: Int): Int = law match {
    case "log" => 3 + 2 * b
    case s if s.startsWith("sqrt:") =>
      3 + s.stripPrefix("sqrt:").toInt * (1 << ((b + 1) / 2))
    case s if s.startsWith("frac:") =>
      math.max(3 + 2 * b,
        math.ceil(NumLabels.toDouble * (1L << b) / s.stripPrefix("frac:").toInt).toInt)
    case other => throw new IllegalArgumentException(
      s"probeLaw '$other' — expected log | sqrt:<c> | frac:<k>")
  }

  /** Emit cap of the cached per-vector cell ranking (the
    * graft_ivf_topcells limit). The default covers the shipped log law
    * at its MaxBits ceiling; a probe-law sweep raises
    * `spark.graft.ann.maxRank` alongside the law so the cache holds at
    * least nprobe ranks (RecallProbe computes both from N). */
  private def maxRank(spark: SparkSession): Int =
    spark.conf.get("spark.graft.ann.maxRank", (3 + 2 * MaxBits).toString).toInt

  /** Per-task source-byte budget for the ANN candidate join, scaled to the
    * PROBE budget actually in force: candidate volume per source byte is
    * ∝ nprobe, so the per-task budget that keeps the candidate sort
    * resident shrinks by the same factor (round 18 — the ×300 sqrt:4
    * probe OOM'd the candidate sort at the width the 128 KB budget
    * yields, because that budget was ProfileJobs-measured UNDER THE
    * SHIPPED LAW; a 5.7× candidate multiplier needs a ~5.7× wider sort).
    * `maxRank` is the driver-side proxy — the sweep/serving contract
    * sets it to the actual nprobe (RecallProbe computes it from N), and
    * at its 35 default this is EXACTLY ScaleRules.AnnCandidateTaskBytes,
    * so every unset-knob plan keeps its width byte-identical
    * (Round18OpsSpec pins both branches). Floor of 4 KB: maxRank is a
    * session conf, and an absurd value must degrade to more tasks, not a
    * zero budget — which requires the divisor itself to be clamped ≥ 1
    * (round-18 ADVICE: maxRank=0 threw ArithmeticException and negative
    * values silently floored, despite this docstring's promise). */
  private[graft] def annCandidateTaskBytes(spark: SparkSession): Long =
    math.max(4L << 10,
      graft.ScaleRules.AnnCandidateTaskBytes * (3 + 2 * MaxBits)
        / math.max(1, maxRank(spark)))

  /** Sign-bit bucket: bit j set iff hyperplane-j projection > 0, low b bits
    * only. The projection folds left-to-right in double (zip_with +
    * aggregate), matching DuckDB's list_aggregate('sum') fold, so the sign
    * — and hence the bucket — is parity-exact. */
  private def bucketCol(bBits: Column): Column =
    (0 until MaxBits).map { j =>
      val wj = array((0 until Dim).map(i => lit(hyperWeight(j, i))): _*)
      val dj = aggregate(
        zip_with(col("embedding"), wj, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(lit(j) < bBits && dj > 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Every vector with its OWN coarse cell attached (vcell =
    * label·2^MaxBits + sign-projection bucket — the shift clears the full
    * bucket range, so cells never collide across labels) — the
    * corpus-tracking blocking key shared by the IVF index build and
    * `llm_semdedup`. Corpus size → bucket bits is attached as a broadcast
    * scalar (no collect). */
  private def cellAssigned(spark: SparkSession, sfDir: String): DataFrame = {
    val nRow = Tables.embeddings(spark, sfDir).agg(count(lit(1)).as("n_total"))
    Fanout.broadcastAll(emb(spark, sfDir), nRow, col("vec_id"), col("n_total"))
      .withColumn("b_bits", bucketBits(col("n_total")))
      .withColumn("vcell",
        col("label").cast("long") * lit(1L << MaxBits) + bucketCol(col("b_bits")))
  }

  /** Per-cell rounded centroids (cell, centroid float[], centroid_nrm) —
    * shared by the scored-cell cache build and the IVF-PQ residual coder
    * (same expressions, so the two consumers cannot drift). */
  private def centroidRelation(spark: SparkSession, sfDir: String): DataFrame = {
    val e = cellAssigned(spark, sfDir)
    val sums = (0 until Dim).map(i =>
      sum(element_at(col("embedding"), i + 1).cast("double")).as(s"s$i"))
    e.groupBy(col("vcell").as("cell"))
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("cell"), array((0 until Dim).map(i =>
        round(col(s"s$i") / col("n"), 4).cast("float")): _*).as("centroid"))
      // norm once per centroid BEFORE the broadcast, not once per (vector, cell) pair
      .withColumn("centroid_nrm", norm("centroid"))
  }

  /** The whole centroid index as ONE row of three parallel cell-ascending
    * arrays (ids, row-major flattened centroids, norms): k·(8+4·Dim+8)
    * bytes — ~2.8 MB at the ×300 probe's N=600k (10·2^10 cells), ~178 MB
    * at the MaxBits=16 saturation point (N ≈ 8.6×10⁹ — see the MaxBits
    * doc; a dimension table at every reachable scale). Flat primitive
    * arrays (not array<struct>) so the scorer's hot loop reads them with
    * zero per-cell allocations; array_sort on the struct list orders by
    * its first field (cell), making the layout deterministic. Shared by
    * the scored-cell cache build and the k-means assignment step (same
    * layout, so the two `graft_ivf_topcells` consumers cannot drift). */
  private def centroidMatrix(centroids: DataFrame): DataFrame =
    centroids
      .agg(array_sort(collect_list(struct(col("cell"), col("centroid"), col("centroid_nrm")))).as("cs"))
      .select(
        transform(col("cs"), c => c.getField("cell")).as("cells"),
        flatten(transform(col("cs"), c => c.getField("centroid"))).as("cflat"),
        transform(col("cs"), c => c.getField("centroid_nrm")).as("cnrms"))

  /** Serving memo for the TRAINED centroid relation: the k-row result is
    * lazily cached (plan construction only — the ServingMemo lock is
    * never held across a job), so the PQ coder and the cell-scored build
    * reuse one training run instead of re-paying `rounds` corpus passes
    * per consumer. */
  private val trainedMemo = new ServingMemo(MemoCap)

  /** Centroid-source dispatcher (round 17, the r16 verdict's item #2:
    * decide the trained-centroid fork with data). Unset, the quantizer is
    * the shipped data-OBLIVIOUS one (sign-projection cells → per-cell
    * means — the formula the DuckDB oracle replays), so every oracle row,
    * plan and hash is unchanged. `spark.graft.ann.centroids = trained[:r]`
    * swaps in k-means-TRAINED centroids at the SAME cell count
    * (NumLabels·2^b ∝ √N): probe law, rank cap and every downstream
    * consumer (cell scoring, candidate join, PQ residual coder) see an
    * identical budget, so a measured recall difference is attributable
    * purely to centroid PLACEMENT. Spec-gated (Round17OpsSpec pins
    * determinism, schema, k-sizing and the sf0.1 recall floor); measured
    * at the large-N divergence points by tools/RecallProbe — numbers in
    * SCALE.md round 17. Like probeLaw, the knob is read at BUILD time;
    * the trained relation itself memoizes per (session, dir, rounds),
    * but every DOWNSTREAM result (cell cache, serve shortlists) memoizes
    * without the knob in its key — set it once per (session, dir), or
    * releaseCellCache between flips (the spec and RecallProbe do). */
  private[graft] def quantizerCentroids(spark: SparkSession, sfDir: String): DataFrame =
    spark.conf.get("spark.graft.ann.centroids", "oblivious") match {
      case "oblivious" => centroidRelation(spark, sfDir)
      case t if t == "trained" || t.startsWith("trained:") =>
        val rounds = if (t == "trained") 4 else t.stripPrefix("trained:").toInt
        require(rounds >= 1 && rounds <= 16, s"trained rounds $rounds not in [1,16]")
        // rounds is part of the memo key: trained:1 → trained:8 in one
        // session must retrain, not serve the first training's cache
        // (r17 advisory). Downstream consumers still memoize without the
        // knob — releaseCellCache between flips remains required.
        trainedMemo.get(spark, s"$sfDir#trained:$rounds")(
          trainedCentroidRelation(spark, sfDir, rounds).cache())
      case other => throw new IllegalArgumentException(
        s"spark.graft.ann.centroids '$other' — expected oblivious | trained[:rounds]")
    }

  /** k-means (spherical: cosine assignment via `graft_ivf_topcells`
    * rank-1, mean update) centroids — fully deterministic and fully lazy:
    *  - k = NumLabels·2^b, the oblivious law's cell count at this N, so
    *    the cell-count law (and with it build candidate volume ~N^1.5) is
    *    unchanged — only placement is trained;
    *  - seeds are a hash-stride sample (xxhash64(vec_id) mod ⌊N/k⌋ = 0 —
    *    ~k data points, rerun-stable, no RNG), cell id = seed vec_id;
    *  - `rounds` Lloyd rounds, each one broadcast fan-out of the one-row
    *    centroid matrix + one groupBy mean: N·k dots per round with NO
    *    shuffled candidate volume — each round costs one in-row centroid
    *    scan (~N^1.5 flops, the ×300-measured 23–26 s stage), so training
    *    multiplies the build's scan side by ~rounds and leaves the
    *    dominant candidate join untouched;
    *  - cells that lose all members simply drop out of the next round's
    *    matrix (k decays slightly — the scorer ranks whatever exists);
    *  - per-round sums and means accumulate in double, but each round's
    *    updated means are float-cast before the next assignment (the
    *    centroid-matrix layout is array<float>); the 4 dp rounding (like
    *    the oblivious relation) happens only at the END. Determinism is
    *    per configuration — it rests on the fixed per-partition fold
    *    order, i.e. stable for a given partitioning/config, not an
    *    FP-associativity guarantee across machines.
    * The plan is a `rounds`-deep chain of broadcast exchanges — lazy (no
    * job at construction, preserving both the ServingMemo contract and
    * PlanSpec's plans-without-jobs invariant). */
  private[graft] def trainedCentroidRelation(
      spark: SparkSession, sfDir: String, rounds: Int): DataFrame = {
    graft.functions.IvfTopCells.register(spark)
    val e = emb(spark, sfDir).select("vec_id", "embedding", "nrm")
    val nRow = Tables.embeddings(spark, sfDir).agg(count(lit(1)).as("n_total"))
    val seeds = Fanout.broadcastAll(e, nRow, col("vec_id"), col("n_total"))
      .withColumn("k",
        lit(NumLabels.toDouble) * pow(lit(2.0), bucketBits(col("n_total"))))
      .filter(pmod(xxhash64(col("vec_id")),
        greatest(lit(1L), floor(col("n_total") / col("k")).cast("long"))) === 0L)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
      .withColumn("centroid_nrm", norm("centroid"))
    val sums = (0 until Dim).map(i =>
      sum(element_at(col("embedding"), i + 1).cast("double")).as(s"s$i"))
    val fin = (1 to rounds).foldLeft(seeds) { (cents, _) =>
      Fanout.broadcastAll(e, centroidMatrix(cents), col("vec_id"), size(col("cells")))
        .withColumn("tc",
          explode(expr("graft_ivf_topcells(embedding, nrm, cells, cflat, cnrms, 1)")))
        .select(col("tc.cell").as("cell"), col("embedding"))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"), sums: _*)
        .select(col("cell"), array((0 until Dim).map(i =>
          (col(s"s$i") / col("n")).cast("float")): _*).as("centroid"))
        .withColumn("centroid_nrm", norm("centroid"))
    }
    fin.select(col("cell"),
        transform(col("centroid"), c =>
          round(c.cast("double"), 4).cast("float")).as("centroid"))
      .withColumn("centroid_nrm", norm("centroid"))
  }

  private def buildCellScored(spark: SparkSession, sfDir: String): DataFrame = {
    val matrix = centroidMatrix(quantizerCentroids(spark, sfDir))
    // Cached NARROW ranked top cells (vec_id, cell, dist2cell, cell_rank):
    // the relation is consumed twice per query (rank-1 index side + top-
    // (3+2b) probe side) and by TWO declared queries (llm_ann_ivf,
    // llm_knn_label) in the same session; without the cache each consumer
    // re-plans and re-codegens the whole centroid pipeline.
    // Round 6 narrowed the cached rows, round 7 capped them at rank ≤
    // 3+2·MaxBits; round 8 removes the N×k relation ALTOGETHER. The old
    // formulation exploded every (vector, centroid) pair (broadcast
    // fan-out → ~N·k 24-byte rows → per-vector ranking sort): at the 100×
    // sweep point that stage was ~61 GB of spill traffic and 52–98 s of
    // wall across same-code sweeps — all to keep ≤19 rows/vector. Now the
    // scorer (`graft_ivf_topcells`, a native expression) ranks all k cells
    // against each vector IN the row pipeline with a bounded insertion
    // pass and emits only the top-(3+2·MaxBits) structs; the only joins
    // are broadcast fan-outs of one single-row dimension table. Same dot
    // fold order, same (dist DESC, cell ASC) comparator semantics — the
    // cached relation is byte-identical to the fan-out formulation's, so
    // neither the oracle nor the recall spec can tell the difference.
    // Lazy (PlanSpec can still build plans without triggering jobs).
    // The repartition pins the SCORING parallelism (k·Dim flops per row)
    // to the session's shuffle width, not the scan's file-split layout
    // (the 100-file synthesized table at 100× packs into ~4 input splits),
    // and both consumers group/window on vec_id so the cache's
    // partitioning is reused with no further exchange.
    val parts = spark.sessionState.conf.numShufflePartitions
    graft.functions.IvfTopCells.register(spark)
    Fanout.broadcastAll(
        emb(spark, sfDir).select("vec_id", "embedding", "nrm")
          .repartition(parts, col("vec_id")),
        matrix, col("vec_id"), size(col("cells")))
      .withColumn("tc", explode(expr(
        s"graft_ivf_topcells(embedding, nrm, cells, cflat, cnrms, ${maxRank(spark)})")))
      .select(col("vec_id"), col("tc.cell").as("cell"),
        col("tc.dist2cell").as("dist2cell"), col("tc.cell_rank").as("cell_rank"))
      .cache()
  }

  /** IVF-style ANN candidates → top-5: each vector indexes into its nearest
    * cell and probes the 3+2b nearest cells at query time, so candidate
    * generation is an equi-join on cell id — never all pairs. Both sides
    * read the ONE cached per-vector cell ranking (cellScored): the index
    * side is the rank-1 row (highest similarity, ties to the smallest
    * cell), the probe side ranks ≤ 3+2b — no argmax aggregate and no
    * per-consumer window re-sort. Deterministic (rounded centroids, total
    * orders), hence oracle-checkable; LlmSpec additionally measures recall
    * vs the exact baseline. This is the 100-TB similarity-search path. */
  private def annTopkCore(spark: SparkSession, sfDir: String): DataFrame =
    topkMemo.get(spark, sfDir)(buildAnnTopk(spark, sfDir).cache())

  private def buildAnnTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val ranked = cellScored(spark, sfDir)
    // ranked is narrow (round 6/7) — embeddings re-attach by vec_id
    // equi-join (linear, broadcast at small N / shuffled at scale) instead
    // of riding every ranked row through the join
    val vecs = emb(spark, sfDir).select("vec_id", "embedding", "nrm")
    val indexed = ranked.filter(col("cell_rank") === 1)
      .join(vecs, "vec_id")
      .select(col("vec_id").as("b"), col("cell"),
        col("embedding").as("eb"), col("nrm").as("nb"))
    // nprobe scales with the bucket-bit budget (3 + 2b): more cells means
    // each holds a smaller slice of a vector's true neighborhood, so a
    // fixed nprobe=3 would silently trade the round-6 speedup for recall
    // (measured at sf0.1/b=2: recall@5 vs exact = 0.24 at nprobe 3 → 0.44
    // at 3+2b=7). Candidates/vector stay ~bounded (~nprobe · 512-row
    // cells), so total work grows ~N·log N — the textbook IVF knob.
    val nRow = Tables.embeddings(spark, sfDir).agg(count(lit(1)).as("n_total"))
    val probes = Fanout.broadcastAll(ranked, nRow, col("vec_id"), col("n_total"))
      .filter(col("cell_rank") <= nprobeCol(spark, bucketBits(col("n_total"))))
      .join(vecs, "vec_id")
      .select(col("vec_id").as("a"), col("cell"),
        col("embedding").as("ea"), col("nrm").as("na"))
    // The cell id alone has only k distinct values, and the shuffled bytes
    // are small enough that AQE coalesces the probe⋈index join to ONE
    // partition — which serializes every candidate dot product into a
    // single task (measured: a 2.4 s single-task stage, the bulk of this
    // query's time). Sub-fragment the join like cosineTopkCore: each
    // cell's index shard is replicated over nFrag sub-buckets, probes
    // hash into one of them, and the numbered repartition + shuffle_hash
    // hint pin the dot-product stage partition-parallel. Same candidate
    // set, same values — only the physical distribution changes.
    val nFrag = 8
    val indexedF = indexed.withColumn("frag", explode(sequence(lit(0), lit(nFrag - 1))))
    val probesF = probes.withColumn("frag", pmod(hash(col("a")), lit(nFrag)))
    // Candidate-join width: the dot-product + map-side WindowGroupLimit
    // stage sorts EVERY candidate (a, b, cos) row, and at ×100 the
    // session-width (32-task) form spilled 40.8 GB mem + 8.2 GB disk in
    // that one stage — 66.5 of the build's 79.5 s (round-14 ProfileJobs;
    // the same spill-onset signature as the round-13 graph builds). The
    // shared hysteresis rule widens it past onset (×100 → ~205 tasks,
    // candidate sort buffers resident) and leaves every other scale's
    // plan byte-identical (sf0.1/×10/×30 stay at session width; ×30's
    // measured band was already healthy). (cell, frag) has ~20k distinct
    // keys, so the wide hash distribution stays balanced.
    val parts = graft.ScaleRules.wideBuildWidth(
      spark, s"$sfDir/embeddings.parquet", annCandidateTaskBytes(spark))
    topkWithin(probesF.repartition(parts, col("cell"), col("frag"))
      .join(indexedF.hint("shuffle_hash"), Seq("cell", "frag"))
      .filter(col("a") =!= col("b"))
      .withColumn("cos", dot("ea", "eb") / (col("na") * col("nb")))
      .select("a", "b", "cos"))
  }

  def llmAnnIvf(spark: SparkSession, sfDir: String): DataFrame =
    annTopkCore(spark, sfDir).orderBy("a", "rank")

  /** Candidate relation for an EXTERNAL query stream against the serving
    * index — the deployment shape the IVF index exists for (index once,
    * serve an unbounded query stream), shared by `StreamOps.streamAnnServe`
    * (round 18). `queries` is unbounded (qid, embedding float[Dim]); the
    * result is the stream of (qid, nn candidate, exact cos) rows:
    *
    *  - each query row ranks its top-nprobe cells IN-ROW against the
    *    broadcast one-row centroid matrix (`graft_ivf_topcells` — the same
    *    expression, matrix and probe law as the batch build, so a query
    *    vector that exists in the corpus probes EXACTLY the cells
    *    `llm_ann_ivf` probes for it);
    *  - candidates come from a stream-STATIC equi-join on cell against the
    *    memoized rank-1 index side (`cellScored`, the same cached relation
    *    the batch serve reads) — stateless in the stream, so no watermark
    *    and no state store; per-query work is nprobe·cell-occupancy dot
    *    products, identical to a batch probe;
    *  - self-matches drop (a served query never returns its own id).
    *
    * nprobe/bit-budget are fixed at STREAM-SETUP time from the corpus
    * count (one setup job — serving setup already materializes the index;
    * the law and centroid knobs are read through the same dispatchers as
    * the batch build, so the serving profile's confs apply unchanged). */
  private[graft] def annServeCandidates(
      spark: SparkSession, sfDir: String, queries: DataFrame): DataFrame = {
    graft.functions.IvfTopCells.register(spark)
    // count(*) over ALL embeddings rows — the batch path's nRow and the
    // DuckDB bparam both count unfiltered, and bucketBitsScalar can land
    // one bit lower under an isNotNull filter when null embeddings exist
    // (round-18 ADVICE: the stream must probe EXACTLY the batch cells)
    val n = Tables.embeddings(spark, sfDir).count()
    val nprobe = math.min(
      nprobeScalar(spark.conf.get("spark.graft.ann.probeLaw", "log"),
        bucketBitsScalar(n)),
      maxRank(spark))
    val vecs = emb(spark, sfDir).select("vec_id", "embedding", "nrm")
    val indexed = cellScored(spark, sfDir).filter(col("cell_rank") === 1)
      .join(vecs, "vec_id")
      .select(col("vec_id").as("b"), col("cell"),
        col("embedding").as("eb"), col("nrm").as("nb"))
    val matrix = centroidMatrix(quantizerCentroids(spark, sfDir))
    Fanout.broadcastAll(queries.withColumn("nq", norm("embedding")),
        matrix, col("qid"), size(col("cells")))
      .withColumn("tc", explode(expr(
        s"graft_ivf_topcells(embedding, nq, cells, cflat, cnrms, $nprobe)")))
      .select(col("qid"), col("tc.cell").as("cell"),
        col("embedding").as("eq"), col("nq"))
      .join(indexed, "cell")
      .filter(col("b") =!= col("qid"))
      .withColumn("cos", dot("eq", "eb") / (col("nq") * col("nb")))
      .select("qid", "b", "cos")
  }

  /** Serving memo for the IVF-PQ codes index — the 4×-smaller residency
    * the compose exists for (same lifecycle as the float memos). */
  private val pqMemo = new ServingMemo(MemoCap)

  /** Every vector with its rank-1 cell, its centroid, and the RESIDUAL
    * (embedding − centroid, in double) — the quantity IVF-PQ quantizes:
    * residuals concentrate near 0 within a cell, so a fixed bit budget
    * spends its precision where the data is. */
  private def pqResiduals(spark: SparkSession, sfDir: String): DataFrame = {
    val own = cellScored(spark, sfDir).filter(col("cell_rank") === 1)
      .select("vec_id", "cell")
    emb(spark, sfDir).select("vec_id", "embedding")
      .join(own, "vec_id")
      .join(broadcast(quantizerCentroids(spark, sfDir).select("cell", "centroid")), "cell")
      .withColumn("resid", expr(
        s"""transform(sequence(0, ${Dim - 1}), i ->
           |  CAST(element_at(embedding, i+1) AS DOUBLE)
           |  - CAST(element_at(centroid, i+1) AS DOUBLE))""".stripMargin))
  }

  /** The per-cell coder dimension table (cell-count rows — ~10k at the
    * ×300 probe, ~655k at the MaxBits cap): exact per-dimension
    * residual bounds plus the decode affine — base = centroid + lo and
    * scale = (hi − lo)/255, so decode is b̂ᵢ = baseᵢ + (codeᵢ+128)·scaleᵢ.
    * Bounds are min/max selections (no float-sum drift), deterministic. */
  private def pqCellDim(spark: SparkSession, sfDir: String): DataFrame = {
    val stats = pqResiduals(spark, sfDir)
      .select(col("cell"), posexplode(col("resid")).as(Seq("pos", "v")))
      .groupBy("cell", "pos").agg(min("v").as("lo"), max("v").as("hi"))
    stats.groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("lo"), col("hi")))).as("plh"))
      .select(col("cell"),
        transform(col("plh"), p => p.getField("lo")).as("lows"),
        transform(col("plh"), p => p.getField("hi")).as("highs"))
      .join(broadcast(quantizerCentroids(spark, sfDir).select("cell", "centroid")), "cell")
      .select(col("cell"), col("lows"),
        expr(s"""transform(sequence(0, ${Dim - 1}), i ->
           |  CAST(element_at(centroid, i+1) AS DOUBLE) + element_at(lows, i+1))""".stripMargin)
          .as("base"),
        expr(s"""transform(sequence(0, ${Dim - 1}), i ->
           |  (element_at(highs, i+1) - element_at(lows, i+1)) / 255.0D)""".stripMargin)
          .as("scale"))
  }

  private def pqIndex(spark: SparkSession, sfDir: String): DataFrame =
    pqMemo.get(spark, sfDir)(buildPqIndex(spark, sfDir).cache())

  /** The IVF-PQ serving index: one row per vector holding ONLY its cell,
    * the uint8 residual codes (stored −128-shifted as array<tinyint> —
    * one byte per dimension, 4× smaller than the float vector), and the
    * reconstructed norm. This is the billion-vector memory layout:
    * together with the cell-count-row coder table it is the ENTIRE serving
    * state — the float embeddings are only touched again to refine a
    * 20-candidate shortlist per query. Codes are exact-deterministic
    * (integer rounding on exact min/max bounds; the fp-safety clamp can
    * only fire on the boundary value itself). */
  private def buildPqIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val codeExpr = expr(
      s"""transform(sequence(0, ${Dim - 1}), i ->
         |  CAST(CASE WHEN element_at(scale, i+1) = 0.0D THEN -128
         |    ELSE least(127, greatest(-128,
         |      CAST(floor((element_at(resid, i+1) - element_at(lows, i+1))
         |        / element_at(scale, i+1) + 0.5D) AS INT) - 128))
         |  END AS TINYINT))""".stripMargin)
    pqResiduals(spark, sfDir)
      .join(broadcast(pqCellDim(spark, sfDir)), "cell")
      .withColumn("codes", codeExpr)
      .withColumn("rnorm", expr(
        s"""sqrt(aggregate(sequence(0, ${Dim - 1}), 0.0D, (acc, i) ->
           |  acc + pow(element_at(base, i+1)
           |    + (CAST(element_at(codes, i+1) AS DOUBLE) + 128.0D)
           |      * element_at(scale, i+1), 2.0D)))""".stripMargin))
      .select(col("vec_id").as("b"), col("cell"), col("codes"), col("rnorm"))
  }

  /** IVF-PQ ANN — `llm_ann_ivf`'s cell probing composed with
    * `llm_embed_quantize`'s uint8 machinery applied to RESIDUALS inside
    * each cell: candidates are scored from the codes index alone (the
    * codegen'd `graft_pq_dot` decode-dot — the serving state never holds
    * floats; the same scoring as a SQL higher-order `aggregate` lambda
    * measured ×48 at the 30× sweep, interpreted closures per element),
    * the top-20 shortlist per query is then refined with exact dot
    * products, and the final top-5 is emitted by exact score. Work per
    * query is the same nprobe·cell-size candidate set as plain IVF —
    * including its anti-coalesce sub-fragmentation (without it AQE folds
    * the few-distinct-cell join to one partition and serializes every
    * decode-dot into a single task); memory per served vector drops 4×
    * in payload (64 code bytes vs 256 float bytes), which is what decides
    * how many vectors fit a serving tier at 10⁹ scale. Like plain IVF the
    * result memoizes (build-once/serve-cheap; ScaleStress reports the
    * `_build` line separately). LlmSpec pins recall@5 ≥ the plain-IVF
    * floor on the real sf0.1 embeddings and measures the cached codes
    * index vs the float layout with per-row byte pins; no oracle (the
    * shortlist refinement's tie behavior is engine-internal — the exact
    * path `llm_ann_ivf` is the oracle-checked row). */
  private def buildAnnPqTopk(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.PqDotExprs.register(spark)
    val ranked = cellScored(spark, sfDir)
    val codes = pqIndex(spark, sfDir)
    val nRow = Tables.embeddings(spark, sfDir).agg(count(lit(1)).as("n_total"))
    val probes = Fanout.broadcastAll(ranked, nRow, col("vec_id"), col("n_total"))
      .filter(col("cell_rank") <= nprobeCol(spark, bucketBits(col("n_total"))))
      .join(emb(spark, sfDir).select("vec_id", "embedding", "nrm"), "vec_id")
      .select(col("vec_id").as("a"), col("cell"),
        col("embedding").as("ea"), col("nrm").as("na"))
    // sub-fragment the probe⋈codes join exactly like buildAnnTopk: the
    // cell key alone has few distinct values and AQE would coalesce the
    // decode-dot stage to one task
    val nFrag = 8
    val codesF = codes.withColumn("frag", explode(sequence(lit(0), lit(nFrag - 1))))
    val probesF = probes.withColumn("frag", pmod(hash(col("a")), lit(nFrag)))
    // Same spill-onset width as buildAnnTopk: the round-14 ×100 profile
    // showed the decode-dot + shortlist-window stage with the IDENTICAL
    // 32-task signature (40.8 GB mem + 8.2 GB disk spill, 68.9 s) — the
    // shortlist sort runs over the same ~per-candidate row count as the
    // plain-IVF candidate sort, so it shares AnnCandidateTaskBytes.
    val parts = graft.ScaleRules.wideBuildWidth(
      spark, s"$sfDir/embeddings.parquet", annCandidateTaskBytes(spark))
    val approx = probesF.repartition(parts, col("cell"), col("frag"))
      .join(codesF.hint("shuffle_hash"), Seq("cell", "frag"))
      .filter(col("a") =!= col("b"))
      .join(broadcast(pqCellDim(spark, sfDir).select("cell", "base", "scale")), "cell")
      .withColumn("acos",
        expr("graft_pq_dot(ea, codes, base, scale)") / (col("na") * col("rnorm")))
    // narrow shortlist BEFORE the window (topkWithin's wide-row lesson),
    // then re-attach floats for the exact refinement of 20 rows/query
    val w = Window.partitionBy("a").orderBy(desc("acos"), asc("b"))
    val shortlist = approx.select("a", "b", "acos")
      .withColumn("r", row_number().over(w)).filter(col("r") <= 20)
      .select("a", "b")
    val va = emb(spark, sfDir)
      .select(col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
    val vb = emb(spark, sfDir)
      .select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
    topkWithin(shortlist.join(va, "a").join(vb, "b")
      .withColumn("cos", dot("ea", "eb") / (col("na") * col("nb")))
      .select("a", "b", "cos"))
  }

  /** Memoized PQ top-k (the annTopkCore pattern): repeat serves read the
    * cached result; the first call per (session, sfDir) pays the build. */
  private val pqTopkMemo = new ServingMemo(MemoCap)

  def llmAnnIvfPq(spark: SparkSession, sfDir: String): DataFrame =
    pqTopkMemo.get(spark, sfDir)(buildAnnPqTopk(spark, sfDir).cache())
      .orderBy("a", "rank")

  /** Spec hooks: the serving index and its float-resident counterpart,
    * for the memory A/B (cache both, compare measured storage bytes). */
  private[graft] def pqIndexForSpec(spark: SparkSession, sfDir: String): DataFrame =
    buildPqIndex(spark, sfDir)
  private[graft] def floatIndexForSpec(spark: SparkSession, sfDir: String): DataFrame = {
    val own = cellScored(spark, sfDir).filter(col("cell_rank") === 1)
      .select("vec_id", "cell")
    emb(spark, sfDir).select(col("vec_id").as("b"), col("embedding"), col("nrm"))
      .join(own, col("b") === col("vec_id")).select("b", "cell", "embedding", "nrm")
  }

  /** Scalar (per-dimension min/max → uint8) embedding quantization — the
    * memory side of similarity search at 100 TB: 4× smaller vectors to
    * broadcast/probe, with the reconstruction error quantifying the recall
    * cost. Bounds come from an exact per-dimension min/max aggregate
    * (selections — no float-sum drift, so both engines see identical
    * bounds) broadcast to every row via Fanout; codes are integers, so
    * `code_sum` is parity-trivial, and the MSE is the usual left-to-right
    * double fold both engines share. */
  def llmEmbedQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val stats = e.select(posexplode(col("embedding"))).toDF("pos", "v")
      .groupBy("pos").agg(min(col("v").cast("double")).as("lo"),
        max(col("v").cast("double")).as("hi"))
    val bounds = stats
      .groupBy().agg(array_sort(collect_list(struct(col("pos"), col("lo"), col("hi")))).as("plh"))
      .select(transform(col("plh"), p => p.getField("lo")).as("lows"),
        transform(col("plh"), p => p.getField("hi")).as("highs"))
    Fanout.broadcastAll(e, bounds, col("vec_id"), col("lows"))
      .withColumn("codes", expr(
        """transform(sequence(0, size(embedding) - 1),
          |  i -> CASE WHEN highs[i] = lows[i] THEN 0L
          |    ELSE CAST(floor((CAST(embedding[i] AS DOUBLE) - lows[i])
          |      / (highs[i] - lows[i]) * 255.0D + 0.5D) AS LONG) END)""".stripMargin))
      .select(col("vec_id"),
        expr("CAST(aggregate(codes, 0L, (acc, x) -> acc + x) AS BIGINT)").as("code_sum"),
        expr(
          """round(aggregate(sequence(0, size(embedding) - 1), CAST(0.0 AS DOUBLE),
            |  (acc, i) -> acc
            |    + (CAST(embedding[i] AS DOUBLE) - (lows[i] + CAST(codes[i] AS DOUBLE) / 255.0D * (highs[i] - lows[i])))
            |    * (CAST(embedding[i] AS DOUBLE) - (lows[i] + CAST(codes[i] AS DOUBLE) / 255.0D * (highs[i] - lows[i]))))
            |  / size(embedding), 6)""".stripMargin).as("mse"))
      .orderBy("vec_id")
  }

  /** Multimodal plumbing: documents as opaque binary payloads with typed
    * metadata; features here are deterministic (byte length + md5) so the
    * pipeline is oracle-checkable end-to-end. The container pack/decode
    * stage lives in MultimodalOps and is its own declared query
    * (`llm_multimodal_decode`). */
  def llmMultimodalFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("meta", struct(col("lang"), col("n_chars")))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        col("meta.lang").as("meta_lang"))
      .orderBy("doc_id")

  /** Deterministic frame sampling over multimodal payloads: every doc's
    * payload is sliced at a fixed stride (frame 16 units every 64, the
    * video-keyframe idiom) and each sampled frame gets a content
    * fingerprint. This is the Spark-side plumbing a real pipeline runs
    * before a decode stage (offset arithmetic, per-frame explode, bounded
    * fan-out of len/stride rows per doc — linear, partial-agg friendly);
    * the container-level decode lives in MultimodalOps.decode (a real
    * length-prefixed GRFT parser — codec libs are absent in this container,
    * so payloads are UTF-8 bytes), and the frames here are sliced from the
    * text payload so both engines can fingerprint the identical bytes. */
  def llmFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val frameLen = 16
    val stride = 64
    // The sub-frame-length guard must come BEFORE the division: Spark's DIV
    // truncates toward zero but DuckDB's // floors, so a negative dividend
    // ((len - frame) for a short doc) would round differently on the two
    // engines. With the CASE, the division only ever sees non-negative
    // values, where the semantics agree.
    Tables.documents(spark, sfDir)
      .withColumn("n_frames", expr(
        s"CASE WHEN length(text) >= $frameLen THEN (length(text) - $frameLen) DIV $stride + 1 ELSE 0 END"))
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx", explode(sequence(lit(0L), col("n_frames") - 1)))
      .select(col("doc_id"), col("frame_idx"),
        md5(expr(s"substring(text, CAST(frame_idx * $stride + 1 AS INT), $frameLen)")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Full multimodal round-trip as a declared query: documents → opaque
    * payload → GRFT container pack → binary frame-record decode → integer
    * features (MultimodalOps). The features are computed from the PARSED
    * container bytes only; the DuckDB oracle independently recomputes them
    * from the source blob with hex-pair arithmetic (`hex(encode(text))` +
    * `CAST('0x..')` byte sums), so a decoder that mis-read the framing —
    * wrong chunk boundary, skipped record, header trust — diverges on the
    * frame-index-weighted checksum and fails the hash gate. mapPartitions
    * per-row binary work; linear, no shuffle before the final sort. */
  def llmMultimodalDecode(spark: SparkSession, sfDir: String): DataFrame =
    MultimodalOps.decode(MultimodalOps.pack(MultimodalOps.fromDocuments(spark, sfDir)))
      .toDF().orderBy("doc_id")

  /** MMR (maximal marginal relevance) diversified re-ranking — the
    * serving-stage operator between retrieval and the context window: a
    * recall stage produces CANDIDATES, the reranker trades relevance
    * against redundancy (score = λ·rel − (1−λ)·max-sim-to-selected,
    * λ = 0.7) so near-duplicate passages don't crowd out coverage.
    * The candidate gather is distributed (exact cosine to the probe —
    * the min-vec_id embedding — via broadcast + TakeOrdered top-32); the
    * greedy loop then runs on the COLLECTED 32-row candidate list — a
    * bounded planning list by the operator's own definition (reranking
    * exists because the candidate set is small; the BPE-argmax
    * convention) — selecting 8 of 32 with ties by vec_id. Driver
    * arithmetic is plain sequential double ops over a deterministically
    * ordered list, so output is rerun-stable. No oracle (greedy
    * selection isn't SQL); Round12OpsSpec replays the greedy invariant
    * per step and pins the diversity win vs the plain top-8. */
  def llmMmrRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val probe = e.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("pid"), col("embedding").as("pe"), col("nrm").as("pn"))
    val cands = e.crossJoin(broadcast(probe))
      .filter(col("vec_id") =!= col("pid"))
      .withColumn("rel", dot("embedding", "pe") / (col("nrm") * col("pn")))
      .orderBy(desc("rel"), col("vec_id")).limit(MmrCandidates)
      .select("vec_id", "rel", "embedding", "nrm")
      .collect() // bounded: exactly MmrCandidates rows (the rerank input)
    val cs = cands.map(r => (r.getLong(0), r.getDouble(1),
      r.getSeq[Float](2).map(_.toDouble).toArray, r.getDouble(3)))
    def cos(a: (Long, Double, Array[Double], Double), b: (Long, Double, Array[Double], Double)): Double = {
      var s = 0.0; var i = 0
      while (i < a._3.length) { s += a._3(i) * b._3(i); i += 1 }
      s / (a._4 * b._4)
    }
    var selected = Vector.empty[(Long, Double, Array[Double], Double, Double)]
    var rest = cs.toList
    while (selected.size < MmrK && rest.nonEmpty) {
      val best = rest.map { c =>
        val maxSim = if (selected.isEmpty) 0.0
          else selected.map(s => cos(c, (s._1, s._2, s._3, s._4))).max
        (c, MmrLambda * c._2 - (1 - MmrLambda) * maxSim)
      }.maxBy { case (c, score) => (score, -c._1) }
      selected :+= ((best._1._1, best._1._2, best._1._3, best._1._4, best._2))
      rest = rest.filterNot(_._1 == best._1._1)
    }
    import spark.implicits._
    selected.zipWithIndex.map { case ((id, rel, _, _, score), i) =>
      ((i + 1).toLong, id,
        BigDecimal(rel).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("rank", "vec_id", "relevance", "mmr_score")
      .orderBy("rank")
  }

  private val MmrCandidates = 32
  private val MmrK = 8
  private val MmrLambda = 0.7

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_multimodal_decode" -> llmMultimodalDecode,
    "llm_frame_sample" -> llmFrameSample,
    "llm_cosine_topk" -> llmCosineTopk,
    "llm_ann_recall" -> llmAnnRecall,
    "llm_knn_label" -> llmKnnLabel,
    "llm_embed_neardup" -> llmEmbedNeardup,
    "llm_semdedup" -> llmSemdedup,
    "llm_ann_ivf" -> llmAnnIvf,
    "llm_ann_ivfpq" -> llmAnnIvfPq,
    "llm_embed_quantize" -> llmEmbedQuantize,
    "llm_multimodal_features" -> llmMultimodalFeatures,
    "llm_mmr_rerank" -> llmMmrRerank,
  )

  private val cosSql =
    """list_aggregate(list_transform(list_zip(ea.embedding, eb.embedding),
      |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
      |  / (sqrt(list_aggregate(list_transform(ea.embedding,
      |       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
      |   * sqrt(list_aggregate(list_transform(eb.embedding,
      |       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))""".stripMargin

  /** DuckDB replay of the deterministic IVF pipeline (cellScored +
    * annTopkCore): composite (label, sign-bucket) cells with the same
    * LCG-derived hyperplanes and count-driven bit budget as the engine
    * (the bucketBits two-regime law, replayed verbatim in `bparam`),
    * rounded centroids cast to REAL, all-cell scoring, rank-1 index /
    * rank ≤ 3+2b probes, candidate pairs with exact per-pair cosine. Ends
    * with a `cand(a, b, cos)` CTE. */
  private val ivfSql =
    """ex AS (
      |  SELECT vec_id, label, embedding,
      |    sqrt(list_aggregate(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
      |  FROM embeddings),
      |bparam AS (
      |  SELECT LEAST(16, GREATEST(0, CAST(ceil(
      |    LEAST(x, 8.0 + (x - 8.0) / 2.0)) AS INT))) AS b
      |  FROM (SELECT log2(count(*) / 512.0) AS x FROM embeddings)),
      |wgt AS (
      |  SELECT j, list(CASE WHEN ((((j * 64 + i + 1) * 1103515245 + 12345)
      |                             % 2147483648) // 65536) % 2 = 0
      |                 THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END
      |                 ORDER BY i) AS w
      |  FROM range(0, 16) t(j), range(0, 64) s(i)
      |  GROUP BY j),
      |sgn AS (
      |  SELECT e.vec_id, w.j,
      |    list_aggregate(list_transform(list_zip(e.embedding, w.w),
      |      p -> CAST(p[1] AS DOUBLE) * p[2]), 'sum') AS d
      |  FROM ex e CROSS JOIN wgt w CROSS JOIN bparam WHERE w.j < bparam.b),
      |buck AS (
      |  SELECT e.vec_id,
      |    CAST(coalesce(sum(CASE WHEN s.d > 0
      |      THEN (CAST(1 AS BIGINT) << s.j) ELSE 0 END), 0) AS BIGINT) AS bucket
      |  FROM ex e LEFT JOIN sgn s ON e.vec_id = s.vec_id
      |  GROUP BY e.vec_id),
      |exc AS (
      |  SELECT e.vec_id, e.embedding, e.nrm,
      |    CAST(e.label AS BIGINT) * 65536 + bk.bucket AS vcell
      |  FROM ex e JOIN buck bk ON e.vec_id = bk.vec_id),
      |cpos AS (
      |  SELECT vcell AS cell, pos, round(avg(CAST(v AS DOUBLE)), 4) AS cv
      |  FROM (SELECT vcell, unnest(embedding) AS v,
      |          generate_subscripts(embedding, 1) AS pos FROM exc)
      |  GROUP BY vcell, pos),
      |centn AS (
      |  SELECT cell, centroid,
      |    sqrt(list_aggregate(list_transform(centroid,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS cnrm
      |  FROM (SELECT cell, list(CAST(cv AS REAL) ORDER BY pos) AS centroid
      |        FROM cpos GROUP BY cell)),
      |ranked AS (
      |  SELECT vec_id, embedding, nrm, cell,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d2c DESC, cell ASC) AS cell_rank
      |  FROM (
      |    SELECT e.vec_id, e.embedding, e.nrm, c.cell,
      |      list_aggregate(list_transform(list_zip(e.embedding, c.centroid),
      |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
      |        / (e.nrm * c.cnrm) AS d2c
      |    FROM ex e CROSS JOIN centn c)),
      |cand AS (
      |  SELECT p.vec_id AS a, i.vec_id AS b,
      |    list_aggregate(list_transform(list_zip(p.embedding, i.embedding),
      |      q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)), 'sum')
      |      / (p.nrm * i.nrm) AS cos
      |  FROM ranked p JOIN ranked i
      |    ON p.cell = i.cell AND i.cell_rank = 1 AND p.vec_id <> i.vec_id
      |  CROSS JOIN bparam
      |  WHERE p.cell_rank <= 3 + 2 * bparam.b)""".stripMargin

  val oracles: Map[String, String] = Map(
    "llm_multimodal_decode" ->
      """WITH b AS (SELECT doc_id, encode(text) AS p FROM documents),
        |s AS (SELECT doc_id, octet_length(p) AS L, hex(p) AS h FROM b),
        |f AS (SELECT doc_id, L,
        |  coalesce(list_aggregate(list_transform(generate_series(1, L),
        |    i -> CAST(concat('0x', substring(h, 2*i-1, 2)) AS BIGINT)), 'sum'), 0) AS checksum,
        |  coalesce(list_aggregate(list_transform(generate_series(1, L),
        |    i -> CAST(concat('0x', substring(h, 2*i-1, 2)) AS BIGINT)
        |         * ((i-1) // 24 + 1)), 'sum'), 0) AS wsum
        |  FROM s)
        |SELECT doc_id, CAST(L AS BIGINT) AS n_bytes,
        |  CAST((L + 23) // 24 AS BIGINT) AS n_frames,
        |  CAST(checksum AS BIGINT) AS checksum, CAST(wsum AS BIGINT) AS wsum
        |FROM f ORDER BY doc_id""".stripMargin,
    "llm_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    CASE WHEN length(text) >= 16
        |         THEN (length(text) - 16) // 64 + 1 ELSE 0 END AS n_frames
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT))) AS frame_idx
        |  FROM d WHERE n_frames > 0)
        |SELECT f.doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  md5(substring(text, CAST(frame_idx * 64 + 1 AS INT), 16)) AS frame_md5
        |FROM f JOIN documents USING (doc_id)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "llm_cosine_topk" ->
      s"""WITH pairs AS (
         |  SELECT ea.vec_id AS a, eb.vec_id AS b,
         |    $cosSql AS cos
         |  FROM embeddings ea JOIN embeddings eb ON ea.vec_id <> eb.vec_id),
         |ranked AS (
         |  SELECT a, b, cos,
         |    row_number() OVER (PARTITION BY a ORDER BY cos DESC, b ASC) AS rank
         |  FROM pairs)
         |SELECT a, b AS nn, rank, round(cos, 6) AS cos FROM ranked
         |WHERE rank <= 5 ORDER BY a, rank""".stripMargin,
    // both halves are this library's own oracle-proven pipelines (ivfSql's
    // cand + the llm_cosine_topk all-pairs ranking), composed: per-label
    // recall@5 of the IVF candidates against the exact baseline
    "llm_ann_recall" ->
      s"""WITH $ivfSql,
         |ann AS (
         |  SELECT a, b FROM (
         |    SELECT a, b,
         |      row_number() OVER (PARTITION BY a ORDER BY cos DESC, b ASC) AS rank
         |    FROM cand) WHERE rank <= 5),
         |exact AS (
         |  SELECT a, b FROM (
         |    SELECT a, b,
         |      row_number() OVER (PARTITION BY a ORDER BY cos DESC, b ASC) AS rank
         |    FROM (SELECT ea.vec_id AS a, eb.vec_id AS b,
         |            $cosSql AS cos
         |          FROM embeddings ea JOIN embeddings eb ON ea.vec_id <> eb.vec_id))
         |  WHERE rank <= 5)
         |SELECT CAST(lb.label AS BIGINT) AS label,
         |  CAST(count(DISTINCT e.a) AS BIGINT) AS n_queries,
         |  CAST(count(*) AS BIGINT) AS exact_pairs,
         |  CAST(sum(CASE WHEN ann.b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |  round(sum(CASE WHEN ann.b IS NOT NULL THEN 1.0 ELSE 0.0 END) / count(*), 4) AS recall5
         |FROM exact e
         |LEFT JOIN ann ON e.a = ann.a AND e.b = ann.b
         |JOIN embeddings lb ON e.a = lb.vec_id
         |GROUP BY lb.label ORDER BY label""".stripMargin,
    "llm_knn_label" ->
      s"""WITH $ivfSql,
         |topk AS (
         |  SELECT a, b FROM (
         |    SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY cos DESC, b ASC) AS rank
         |    FROM cand) WHERE rank <= 5),
         |votes AS (
         |  SELECT topk.a, lb.label AS nn_label, count(*) AS votes
         |  FROM topk JOIN embeddings lb ON topk.b = lb.vec_id
         |  GROUP BY topk.a, lb.label),
         |pred AS (
         |  SELECT a AS vec_id, nn_label AS pred FROM (
         |    SELECT a, nn_label,
         |      row_number() OVER (PARTITION BY a ORDER BY votes DESC, nn_label ASC) AS rn
         |    FROM votes) WHERE rn = 1)
         |SELECT e.label, count(*) AS n,
         |  round(avg(CASE WHEN pred.pred = e.label THEN 1.0 ELSE 0.0 END), 4) AS acc
         |FROM pred JOIN embeddings e USING (vec_id)
         |GROUP BY e.label ORDER BY e.label""".stripMargin,
    "llm_embed_neardup" ->
      s"""SELECT a, b, round(cos, 6) AS cos FROM (
         |  SELECT ea.vec_id AS a, eb.vec_id AS b,
         |    $cosSql AS cos
         |  FROM embeddings ea JOIN embeddings eb
         |    ON ea.label = eb.label AND ea.vec_id < eb.vec_id)
         |WHERE cos >= 0.45 ORDER BY a, b""".stripMargin,
    // cell assignment is the ivfSql prefix through `exc` (vec_id,
    // embedding, nrm, vcell); the unreferenced downstream CTEs (centroids,
    // ranking, candidates) are pruned by DuckDB's optimizer
    "llm_semdedup" ->
      s"""WITH $ivfSql,
         |dropped AS (
         |  SELECT DISTINCT x.vec_id
         |  FROM exc x JOIN exc y
         |    ON x.vcell = y.vcell AND y.vec_id < x.vec_id
         |  WHERE list_aggregate(list_transform(list_zip(x.embedding, y.embedding),
         |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
         |    / (x.nrm * y.nrm) >= 0.45)
         |SELECT e.vec_id, CAST(e.vcell AS BIGINT) AS cell
         |FROM exc e LEFT JOIN dropped d ON e.vec_id = d.vec_id
         |WHERE d.vec_id IS NULL
         |ORDER BY e.vec_id""".stripMargin,
    "llm_ann_ivf" ->
      s"""WITH $ivfSql
         |SELECT a, b AS nn, rank, round(cos, 6) AS cos FROM (
         |  SELECT a, b, cos,
         |    row_number() OVER (PARTITION BY a ORDER BY cos DESC, b ASC) AS rank
         |  FROM cand)
         |WHERE rank <= 5 ORDER BY a, rank""".stripMargin,
    "llm_embed_quantize" ->
      """WITH stats AS (
        |  SELECT pos, min(CAST(v AS DOUBLE)) AS lo, max(CAST(v AS DOUBLE)) AS hi
        |  FROM (SELECT unnest(embedding) AS v,
        |          generate_subscripts(embedding, 1) AS pos FROM embeddings)
        |  GROUP BY pos),
        |b AS (SELECT list(lo ORDER BY pos) AS lows, list(hi ORDER BY pos) AS highs
        |      FROM stats),
        |q AS (
        |  SELECT vec_id, embedding, lows, highs,
        |    list_transform(generate_series(1, len(embedding)),
        |      i -> CASE WHEN highs[i] = lows[i] THEN CAST(0 AS BIGINT)
        |        ELSE CAST(floor((CAST(embedding[i] AS DOUBLE) - lows[i])
        |          / (highs[i] - lows[i]) * 255.0 + 0.5) AS BIGINT) END) AS codes
        |  FROM embeddings CROSS JOIN b)
        |SELECT vec_id,
        |  CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum,
        |  round(list_aggregate(list_transform(generate_series(1, len(embedding)),
        |    i -> (CAST(embedding[i] AS DOUBLE) - (lows[i] + CAST(codes[i] AS DOUBLE) / 255.0 * (highs[i] - lows[i])))
        |       * (CAST(embedding[i] AS DOUBLE) - (lows[i] + CAST(codes[i] AS DOUBLE) / 255.0 * (highs[i] - lows[i])))), 'sum')
        |    / len(embedding), 6) AS mse
        |FROM q ORDER BY vec_id""".stripMargin,
    "llm_multimodal_features" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS payload_md5, lang AS meta_lang
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}

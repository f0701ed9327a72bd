package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over relational-born graphs (SURVEY.md §2.12 extension).
  *
  * The engine already runs one graph algorithm in production disguise —
  * connected components inside the near-dup dedup family (min-label
  * propagation, LlmText). This file makes the graph surface first-class
  * with the other canonical iterative kernel, PageRank, over a graph the
  * warehouse actually has: part co-purchase (two parts are adjacent when
  * some order contains both).
  *
  * Scale notes: the edge build is one self-join co-partitioned on
  * l_orderkey — pair fanout is bounded by order SIZE (≈ lines²/order,
  * order size is a data invariant that does not grow with corpus scale),
  * so edges are ~linear in lineitem rows. Each PageRank iteration is two
  * shuffles (contribution join on the source key, in-sum on the target
  * key) over the edge relation, the textbook distributed-PR shape; ranks
  * are node-sized. Five fixed iterations built as one linear 5-join plan
  * over the cached adjacency, with a SINGLE localCheckpoint at the end
  * (deliberately NO per-iteration checkpoint — each materialization cost
  * more than the lineage it saved at 5 iterations; see the inline note
  * at the iteration loop).
  */
object Graph {

  private val Damping = 0.85
  private val Iters = 5
  // triangle adjacency probe: broadcast the node-sized adjacency table
  // while its array payload (8 B × edge count, ~64 MB at the cap) still
  // hash-builds comfortably; shuffle-hash above it
  private val BcastEdgeMax = 8000000L

  /** Edge-build shuffle width — `ScaleRules.wideBuildWidth` (the factored
    * spill-onset rule; constants, hysteresis rationale, and the round-13
    * ProfileJobs attribution of the 30×→100× build-spill knee live there)
    * over the parquet bytes of the relation the build actually fans out:
    * all three graph builders pair-join lineitem, so that's the path every
    * call site passes — a future builder over a different relation passes
    * its own source instead of inheriting a lineitem assumption. */
  private def buildParts(spark: SparkSession, sfDir: String): Int =
    graft.ScaleRules.wideBuildWidth(spark, s"$sfDir/lineitem.parquet")

  /** PageRank over the part co-purchase graph. Node set = edge endpoints
    * (parts with at least one co-purchase); the graph is SYMMETRIC by
    * construction, so every node has an inbound edge and the iteration
    * never drops rows — the invariant that lets both engines run the
    * pure inner-join recurrence with no dangling-mass bookkeeping.
    * Output is rank × N (the "times uniform" score, O(1)-scaled), rounded
    * to 6: contributions are order-dependent double sums, but at O(1)
    * magnitude the 1e-12 accumulation error is far inside the margin.
    * Oracle: the same 5-step recurrence as a DuckDB recursive CTE. */
  def graphPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    // Materialize the graph ONCE, as NODE-sized adjacency rows (source,
    // sorted-free neighbor array, outdeg), not edge rows: the per-
    // iteration join then probes a node-count relation instead of an
    // edge-count one, and the edge-sized work degrades to an explode
    // that PIPELINES into the partial aggregate (map-side combine on the
    // target key) — no edge-sized hash build, no edge-sized cache scan.
    // The edge-row first cut of this operator cached 3 longs × E rows
    // and re-joined them every iteration: ×29 at the ×100 sweep (133 s);
    // this form caches one packed array per node (~1/3 the bytes) — see
    // SCALE.md for its band. Build shape: after repartition(a),
    // HashPartitioning(a) satisfies the (a,b) dedup clustering AND the
    // groupBy(a) collect — one edge-sized exchange total. The build runs
    // WIDE (buildParts — the ×100 ProfileJobs run measured 43 GB of
    // aggregation-buffer spill in this stage at the 32-task width, 0 at
    // 254) but the finished NODE-sized adjacency is repartitioned back
    // to the session width before caching: iterating at build width was
    // measured SLOWER than the spill it avoided (each of the 5 rounds
    // split into a wide explode stage + a narrow final-agg stage, and
    // map-side combine degraded 843 MB → 2.1 GB per-round shuffle;
    // +36 s at ×100). The cache is the COMPRESSED COLUMNAR DataFrame
    // cache, not localCheckpoint: deserialized row checkpoints OOM'd the
    // 24g sweep JVM at ×100, while columnar batches spill whole batches
    // under pressure.
    val wide = buildParts(spark, sfDir)
    val narrow = spark.sessionState.conf.numShufflePartitions
    val edges = li.toDF("ok", "a").join(li.toDF("ok", "b"), "ok")
      .filter(col("a") =!= col("b"))
      .select("a", "b")
    val built = (if (wide > narrow) edges.repartition(wide, col("a"))
                 else edges.repartition(col("a")))
      .dropDuplicates("a", "b")
      .groupBy("a")
      .agg(collect_list("b").as("nbrs"), count(lit(1)).as("outdeg"))
    val adj = (if (wide > narrow) built.repartition(col("a")) else built)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    adj.count() // materialize the cache before the iteration chain
    val n = adj.agg(count(lit(1)).as("n_total"))
    // ranks carries n_total along so the teleport term needs no rejoin
    var ranks = Fanout.broadcastAll(adj.select("a"), n, col("a"), col("n_total"))
      .select(col("a").as("node"), col("n_total"), (lit(1.0) / col("n_total")).as("r"))
    for (_ <- 1 to Iters) {
      // no per-iteration checkpoint: each iteration references ranks and
      // adj once, so the plan grows LINEARLY (5 joins deep) and the
      // whole recurrence executes as one 5-stage job against the hot
      // adjacency cache when the final checkpoint below materializes it
      ranks = adj
        .join(ranks.select(col("node").as("a"), col("n_total"), col("r")), "a")
        .select(col("n_total"), (col("r") / col("outdeg")).as("c"),
          explode(col("nbrs")).as("node"))
        .groupBy("node")
        .agg(first("n_total").as("n_total"),
          ((lit(1.0 - Damping) / first("n_total")) +
            lit(Damping) * sum(col("c"))).as("r"))
    }
    // eager node-sized checkpoint, then drop the adjacency cache:
    // CacheManager holds strong refs, so a sweep/bench session would
    // otherwise carry a multi-GB entry per (query, sfDir) forever
    val fin = ranks
      .select(col("node"), round(col("r") * col("n_total"), 6).as("pr_scaled"))
      .localCheckpoint()
    adj.unpersist()
    fin.orderBy("node")
  }

  /** Triangle count + global clustering coefficient over the same
    * co-purchase graph — the graph-density statistic beside PageRank's
    * centrality. Degree-ordered orientation (each undirected edge points
    * from its lower-(degree,id) endpoint to the higher one) bounds
    * per-node fanout by OUT-degree: Σ(dout choose 2) instead of
    * Σ(deg choose 2) — ~2× less work on this near-uniform-degree
    * graph, and the difference between feasible and not on a skewed one
    * (a hub's deg² collapses to its oriented dout²). Each triangle is
    * counted exactly once, at its lowest-ordered EDGE: for oriented edge
    * (u,w), every common oriented out-neighbor of u and w closes one
    * triangle, counted by the codegen'd `graft_sorted_intersect_count`
    * merge scan over the two sorted adjacency arrays. This is the
    * compact form of wedge enumeration: the Θ(Σ dout²) comparisons
    * happen INSIDE an edge-row-local merge scan instead of as a
    * materialized wedge-row stream through a semi-join — same asymptotic
    * work, ~15× fewer shuffled rows (the first cut of this operator
    * streamed 35M wedge rows at sf0.1 and ran 7.8 s warm; this form runs
    * the identical result in 3.6 s, and holds ×2.8 at ×10 data where the
    * wedge count grows ~×10). Work is still degree²-sized BY DEFINITION
    * (declared; sweep-capped like the other by-shape rows).
    * Everything is exact integer counting except the final coefficient
    * ratio, rounded at 6. */
  def graphTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.SortedIntersectExprs.register(spark)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    // undirected edge set, one row per {a,b} with a<b; same single
    // edge-sized exchange trick as graphPagerank's build
    val und = li.toDF("ok", "a").join(li.toDF("ok", "b"), "ok")
      .filter(col("a") < col("b"))
      .select("a", "b")
      .repartition(col("a"))
      .dropDuplicates("a", "b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize BEFORE the dependents: the final plan fans out into
    // parallel exchange/subquery futures, and concurrent stages racing a
    // cold cache each recompute the self-join (profiled: 8 duplicate
    // ~1 s stages at sf0.1)
    val nUnd = und.count()
    // node-sized but referenced twice by the oriented build (da and db)
    // and again by n_wedges — cache it or the union-agg runs 3×
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    deg.count()
    // orient by (deg, id): src = lower endpoint in that total order
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("w"))
      // cached pre-partitioned on the wedge pivot: the self-join below
      // then needs NO exchange on either side
      .repartition(col("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    oriented.count() // same cold-cache race as und
    // sorted adjacency arrays, node-sized rows (array payload totals one
    // edge-list); groupBy(u) runs exchange-free over the u-partitioned
    // cache, and the arrays come out sorted-distinct (edges are deduped,
    // sort_array provides the order the merge scan requires)
    val adj = oriented.groupBy("u").agg(sort_array(collect_list("w")).as("nbrs"))
    // per oriented edge (u,w): triangles closed at this edge =
    // |adj(u) ∩ adj(w)| (every common out-neighbor x gives u→w, u→x,
    // w→x — and no other edge of that triangle sees it, so each triangle
    // counts exactly once). Join 1 attaches adj(u) co-partitioned (no
    // exchange on either side); join 2 must re-key by w — broadcast the
    // node-sized adj table when the graph is small enough for its array
    // payload (~16·E bytes) to hash-build, so the edge stream pipelines
    // with ZERO shuffle; past that, shuffle-hash on the edge rows
    // (never sort-merge, which would sort the array-carrying rows on
    // top of moving them).
    val adjW = adj.select(col("u").as("w"), col("nbrs").as("nw"))
    val probe = if (nUnd <= BcastEdgeMax) broadcast(adjW) else adjW.hint("shuffle_hash")
    val tri = oriented.select("u", "w")
      .join(adj.hint("shuffle_hash"), Seq("u"))
      .join(probe, Seq("w"))
      .agg(sum(expr("graft_sorted_intersect_count(nbrs, nw)")).as("n_triangles"))
    val stats = und.agg(count(lit(1)).as("n_edges")).crossJoin(
      deg.agg((sum(col("deg") * (col("deg") - 1)) / lit(2)).cast("long").as("n_wedges")))
    // eager 1-row checkpoint so both caches (read 2× and 3× inside this
    // one action) can be dropped before returning — same cache-lifetime
    // hygiene as graphPagerank
    val fin = stats.crossJoin(tri)
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6).as("clustering"))
      .localCheckpoint()
    und.unpersist()
    deg.unpersist()
    oriented.unpersist()
    fin.orderBy("n_edges")
  }

  // graph_cc iterates min-label propagation to the FIXPOINT (the first
  // cut ran a fixed 8 rounds, and sf0.01 has a component of diameter > 8
  // — the spec caught round 9 still moving labels). The cap only guards
  // a logic bug and fails loudly instead of returning split components
  // (the LlmText.connectedComponents contract).
  private val CcMaxRounds = 64

  /** Connected components over the FREQUENT co-purchase graph (two parts
    * adjacent when they co-occur in ≥ 2 distinct orders) — the segmentation
    * primitive beside PageRank's centrality and the dedup family's
    * doc-clustering CC (LlmText's min-label propagation, which this makes
    * first-class on a relational-born graph). The support-≥2 threshold is
    * the point: the support-1 graph is one giant near-clique (every order
    * fully connects its parts), while requiring a REPEATED pairing leaves
    * a sparse graph whose component-size histogram actually says
    * something. Shape: the thresholded edge build is the same
    * co-partitioned self-join with a groupBy-count instead of a dedup
    * (pair fanout still bounded by order size); propagation runs to the
    * FIXPOINT (ccLabels — per round the pagerank adjacency shape, sum-
    * monotonicity convergence test, loud cap), so the output is true
    * connected components, oracle-matched against DuckDB's recursive
    * transitive closure. Output: top-20 components by size. */
  /** The support-≥2 symmetric pair list — factored out so the spec can
    * assert the defining CC property (every edge's endpoints share a
    * label) against exactly the operator's edges. */
  private[graft] def ccPairs(spark: SparkSession, sfDir: String): DataFrame =
    ccPairs(spark, sfDir, buildParts(spark, sfDir))

  /** Width-threaded variant: `ccLabels` computes `buildParts` ONCE and
    * passes it both here and to `ccPropagate`, so a graph_cc run does the
    * ScaleRules.sourceBytes filesystem walk once instead of twice (the
    * walks returned identical widths — this is redundant planning I/O,
    * not a correctness issue; round-14 advisory). */
  private[graft] def ccPairs(spark: SparkSession, sfDir: String,
      wide: Int): DataFrame = {
    val narrow = spark.sessionState.conf.numShufflePartitions
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    // countDistinct(ok) is unrolled into dedup(a,b,ok) → count so every
    // exchange is width-controlled: the one-distinct aggregate plan ran
    // its pair partial-agg INSIDE the 32-task join stage (69 GB spill at
    // ×100, the knee — see buildParts) and added two conf-width
    // exchanges; here the join stage only writes the pair stream, and
    // HashPartitioning(a,b) satisfies both the (a,b,ok) dedup and the
    // (a,b) count downstream — one width-controlled exchange, zero
    // spill at ×100. (The unroll also won at ×1: 4.5 → 2.8 s.)
    val liW = if (wide > narrow) li.repartition(wide, col("ok")) else li
    val paired = liW.toDF("ok", "a").join(liW.toDF("ok", "b"), "ok")
      .filter(col("a") =!= col("b"))
    (if (wide > narrow) paired.repartition(wide, col("a"), col("b"))
     else paired.repartition(col("a"), col("b")))
      .dropDuplicates("a", "b", "ok")
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .select("a", "b")
  }

  /** The propagation core: Pregel-style driver loop to the FIXPOINT.
    * Graph state is the pagerank adjacency form (self-loop appended so a
    * node's own label competes in the same min and the node set is
    * preserved); per hop one node-sized label exchange + one explode
    * that pipelines into the min partial-agg; rounds 3+ chain TWO hops
    * per checkpointed round (round 19 — hop 2 joins exchange-free on the
    * hop-1 aggregate's partitioning, so deep graphs pay the checkpoint +
    * convergence-aggregate fixed costs half as often, while ≤2-hop
    * graphs keep their old schedule); lineage truncated by an eager
    * per-round localCheckpoint. Convergence check costs one tiny
    * aggregate, no join: labels only ever DECREASE, so the label sum is
    * strictly monotone and fixpoint ⟺ sum unchanged. Returns the
    * checkpointed (node, lbl) relation, edge cache released. */
  private[graft] def ccLabels(spark: SparkSession, sfDir: String): DataFrame = {
    val wide = buildParts(spark, sfDir)
    ccPropagate(ccPairs(spark, sfDir, wide), wide)
  }

  /** Min-label propagation fixpoint over an arbitrary SYMMETRIC (a, b)
    * edge relation — the engine's ONE connected-components core, shared
    * by batch `graph_cc` (support-≥2 co-purchase pairs, wide build past
    * spill onset), the streaming forest consolidation
    * (`StreamOps.ccConsolidate`, which symmetrizes its node-bounded
    * forest and runs at session width), and since round 15 the doc
    * near-dup family (`LlmText.connectedComponents` — the
    * minhash-keep/dedup-cluster/neardup-split CC, whose ×100 cost is a
    * scheduling floor, so this kernel's 2-exchange rounds over the
    * persisted adjacency ARE its scale story).
    * `wide` is the build-stage shuffle width (pass the session width, or
    * 0, for no wide build — see ScaleRules.wideBuildWidth). */
  private[graft] def ccPropagate(pairs: DataFrame, wide: Int): DataFrame = {
    val spark = pairs.sparkSession
    // The self-loop is APPENDED to each node's neighbor array instead of
    // unioned in as extra edge rows: the union form consumed `pairs`
    // twice (edge rows + a distinct node projection), and with the wide
    // build repartition the two subtrees stopped sharing their exchange —
    // the ×100 ProfileJobs run showed the whole join→dedup chain
    // materializing TWICE in parallel (2×14 s). One consumer, one chain.
    // Build runs WIDE past spill onset (buildParts — the 32-task
    // collect_list spilled 22 GB at ×100, 0 at 254), then the node-sized
    // adjacency comes back to session width for the propagation rounds
    // (sub-second per round at 32; the wide form paid an extra stage per
    // round).
    val narrow = spark.sessionState.conf.numShufflePartitions
    val built = (if (wide > narrow) pairs.repartition(wide, col("a"))
                 else pairs.repartition(col("a")))
      .groupBy("a").agg(collect_list("b").as("nbrs0"))
      .select(col("a"), concat(col("nbrs0"), array(col("a"))).as("nbrs"))
    val adjF = (if (wide > narrow) built.repartition(col("a")) else built)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    adjF.count() // materialize before the dependents (cold-cache race)
    var lab = adjF.select(col("a").as("node"), col("a").as("lbl")).localCheckpoint()
    var prevSum = lab.agg(sum("lbl")).head().get(0)
    var converged = prevSum == null // empty graph is trivially converged
    var iter = 0
    var hops = 0
    // One propagation HOP: join labels to the cached adjacency (both sides
    // hash-partitioned on a — no exchange), explode, min per node (the one
    // exchange). Factored so a round can chain hops before checkpointing.
    def hop(l: DataFrame): DataFrame =
      adjF.join(l.select(col("node").as("a"), col("lbl")), "a")
        .select(explode(col("nbrs")).as("node"), col("lbl"))
        .groupBy("node").agg(min("lbl").as("lbl"))
    while (!converged && iter < CcMaxRounds) {
      // Plain one-hop propagation, no pointer jumping: an A/B against the
      // lbl ← lbl(lbl) shortcut (halves rounds, ~20 → 7 at sf0.1) showed
      // the extra node-sized join + checkpoint per round COSTS more than
      // the round savings at every measured scale (x1 7.0 s vs 4.9 s
      // plain; x100 identical inside the band — the ×100 graph is dense,
      // so its diameter is small and plain propagation already converges
      // in ~7 rounds there).
      // Round 19: ADAPTIVE hop pairing. Rounds 1–2 stay single-hop, later
      // rounds chain TWO hops before the checkpoint. Each hop still costs
      // exactly one exchange (the hop-1 aggregate comes out partitioned on
      // node = a, so hop 2's join is exchange-free), but a paired round
      // pays the checkpoint materialization, the convergence aggregate,
      // and their per-job driver/AQE planning gaps HALF as often — the
      // round-19 A/B measured graph_cc (8 hops deep) at 5.99 s old vs
      // 5.11 s with pairing, while UNCONDITIONAL pairing regressed the
      // shallow LLM CC graphs (llm_minhash_dedup_keep converges in ONE
      // hop; pairing from round 1 doubled its propagation work, 2.42 →
      // 3.29 s). Two single-hop rounds first keep every ≤2-hop graph on
      // its exact old schedule; only graphs that are still moving after
      // 2 hops — where depth, not the confirm round, dominates — switch
      // to pairs. Min-label propagation past the fixpoint is idempotent,
      // so over-running one extra hop when a deep graph converges at an
      // odd hop count changes nothing but that hop.
      val hopsThisRound = if (iter < 2) 1 else 2
      val next = (if (hopsThisRound == 1) hop(lab) else hop(hop(lab))).localCheckpoint()
      val s = next.agg(sum("lbl")).head().get(0)
      lab = next
      converged = s == prevSum
      prevSum = s
      iter += 1
      hops += hopsThisRound
    }
    require(converged,
      s"ccPropagate did not converge within $CcMaxRounds rounds ($hops hops) — component diameter bug?")
    System.err.println(s"[ccPropagate] converged in $iter rounds / $hops hops")
    adjF.unpersist()
    lab
  }

  def graphCc(spark: SparkSession, sfDir: String): DataFrame =
    ccLabels(spark, sfDir)
      .groupBy(col("lbl").as("component"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(desc("n_nodes"), col("component"))
      .limit(20)
      .orderBy(desc("n_nodes"), col("component"))

  /** Per-edge Jaccard similarity over the co-purchase graph — the
    * link-prediction / "customers who bought X also bought Y" primitive:
    * for every adjacent part pair, |N(a) ∩ N(b)| / |N(a) ∪ N(b)| over
    * FULL (undirected) neighborhoods, top-20 strongest pairs. Same
    * kernel as graph_triangles: sorted adjacency arrays + the codegen'd
    * `graft_sorted_intersect_count` merge scan, so the Σ deg(a)+deg(b)
    * comparisons run row-local inside edge rows (degree²-sized BY
    * DEFINITION — declared shape, sweep-capped ×10). Degrees come free
    * as size(adjacency), no separate degree join; union size by
    * inclusion-exclusion. The final top-20 is a TakeOrdered over
    * edge-sized scored rows, rounded BEFORE ranking so the order ties
    * on the engine-identical rounded key. */
  def graphJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.SortedIntersectExprs.register(spark)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    // symmetric directed edges, one row per (a,b): the a-partitioned cache
    // serves the adjacency build, the a<b half serves as the pair list
    val sym = li.toDF("ok", "a").join(li.toDF("ok", "b"), "ok")
      .filter(col("a") =!= col("b"))
      .select("a", "b")
      .repartition(col("a"))
      .dropDuplicates("a", "b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSym = sym.count() // materialize before the dependents
    val adj = sym.groupBy("a").agg(sort_array(collect_list("b")).as("nbrs"))
    val adjB = adj.select(col("a").as("b"), col("nbrs").as("nb"))
    // adjB's array payload is 8 B × nSym (each directed edge appears in
    // exactly one source's array) — same budget rule as graph_triangles
    val probe = if (nSym <= BcastEdgeMax) broadcast(adjB) else adjB.hint("shuffle_hash")
    val fin = sym.filter(col("a") < col("b"))
      .join(adj.hint("shuffle_hash"), Seq("a"))  // co-partitioned, no exchange
      .join(probe, Seq("b"))
      .select(col("a").as("part_a"), col("b").as("part_b"),
        expr("graft_sorted_intersect_count(nbrs, nb)").cast("long").as("common_nbrs"),
        (size(col("nbrs")) + size(col("nb"))).cast("long").as("deg_sum"))
      .withColumn("jaccard",
        round(col("common_nbrs") / (col("deg_sum") - col("common_nbrs")), 6))
      .select("part_a", "part_b", "common_nbrs", "jaccard")
      .orderBy(desc("jaccard"), col("part_a"), col("part_b"))
      .limit(20)
      .localCheckpoint() // eager top-20, then drop the edge cache
    sym.unpersist()
    fin.orderBy(desc("jaccard"), col("part_a"), col("part_b"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> graphPagerank,
    "graph_triangles" -> graphTriangles,
    "graph_cc" -> graphCc,
    "graph_jaccard" -> graphJaccard,
  )

  val oracles: Map[String, String] = Map(
    "graph_pagerank" ->
      """WITH RECURSIVE
        |li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT DISTINCT a.p AS a, b.p AS b
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p),
        |deg AS (SELECT a, count(*) AS outdeg FROM edges GROUP BY a),
        |n AS (SELECT count(*) AS n_total FROM deg),
        |pr AS (
        |  SELECT 0 AS it, deg.a AS node, 1.0 / n.n_total AS r
        |  FROM deg CROSS JOIN n
        |  UNION ALL
        |  SELECT p.it + 1, e.b,
        |    0.15 / n.n_total + 0.85 * sum(p.r / d.outdeg)
        |  FROM pr p
        |  JOIN edges e ON p.node = e.a
        |  JOIN deg d ON e.a = d.a
        |  CROSS JOIN n
        |  WHERE p.it < 5
        |  GROUP BY p.it, e.b, n.n_total)
        |SELECT pr.node, round(pr.r * n.n_total, 6) AS pr_scaled
        |FROM pr CROSS JOIN n WHERE pr.it = 5
        |ORDER BY pr.node""".stripMargin,
    "graph_cc" ->
      """WITH RECURSIVE
        |li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |f AS (
        |  SELECT a.p AS a, b.p AS b
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2),
        |n AS (SELECT DISTINCT a AS v FROM f),
        |reach(node, r) AS (
        |  SELECT v, v FROM n
        |  UNION
        |  SELECT f.b, reach.r FROM f JOIN reach ON reach.node = f.a),
        |cc AS (SELECT node, min(r) AS lbl FROM reach GROUP BY node)
        |SELECT lbl AS component, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM cc GROUP BY lbl
        |ORDER BY n_nodes DESC, component LIMIT 20""".stripMargin,
    "graph_jaccard" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS a, b.p AS b
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p),
        |deg AS (SELECT a AS v, count(*) AS d FROM e GROUP BY 1),
        |c AS (SELECT e1.a AS u, e2.a AS w, count(*) AS common
        |      FROM e e1 JOIN e e2 ON e1.b = e2.b AND e1.a < e2.a
        |      GROUP BY 1, 2),
        |pairs AS (
        |  SELECT e.a AS part_a, e.b AS part_b,
        |    CAST(coalesce(c.common, 0) AS BIGINT) AS common_nbrs,
        |    round(CAST(coalesce(c.common, 0) AS DOUBLE) /
        |      (da.d + db.d - coalesce(c.common, 0)), 6) AS jaccard
        |  FROM e
        |  LEFT JOIN c ON c.u = e.a AND c.w = e.b
        |  JOIN deg da ON da.v = e.a
        |  JOIN deg db ON db.v = e.b
        |  WHERE e.a < e.b)
        |SELECT part_a, part_b, common_nbrs, jaccard
        |FROM pairs ORDER BY jaccard DESC, part_a, part_b LIMIT 20""".stripMargin,
    "graph_triangles" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.p AS a, b.p AS b
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
        |deg AS (
        |  SELECT v, count(*) AS deg
        |  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        |  GROUP BY v),
        |tri AS (
        |  SELECT count(*) AS c
        |  FROM e xy
        |  JOIN e yz ON yz.a = xy.b
        |  JOIN e xz ON xz.a = xy.a AND xz.b = yz.b),
        |st AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        |    CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges
        |  FROM deg)
        |SELECT st.n_edges, st.n_wedges, CAST(tri.c AS BIGINT) AS n_triangles,
        |  round(3.0 * tri.c / st.n_wedges, 6) AS clustering
        |FROM st CROSS JOIN tri ORDER BY n_edges""".stripMargin,
  )
}

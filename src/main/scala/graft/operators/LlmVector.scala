package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Embedding / similarity-search / multimodal operators (SURVEY.md §2.10 +
  * builder-prompt extensions).
  *
  * Scale notes:
  *  - Brute-force cosine is the correctness baseline (2000² = 4M pairs at
  *    sf0.1 — fine); the 100 TB path is `llm_ann_ivf`: a coarse quantizer
  *    (per-label centroids, i.e. k-means with known assignments) bounds each
  *    probe to nprobe cells, so candidate generation is a broadcast-join on
  *    cell id instead of a cross join. Centroids are dimension-table sized
  *    (k × 64 floats) — collect+broadcast is the legitimate pattern.
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

  private def emb(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExprs.register(spark)
    Tables.embeddings(spark, sfDir)
      .withColumn("nrm", norm("embedding"))
  }

  /** Unsorted top-5 core shared by the oracle query and the kNN consumer —
    * the determinism orderBy lives only in the top-level query, so composed
    * uses don't inherit a wasted whole-dataset sort. */
  private def cosineTopkCore(spark: SparkSession, sfDir: String): DataFrame = {
    val a = emb(spark, sfDir).select(col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = emb(spark, sfDir).select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
    val w = Window.partitionBy("a").orderBy(desc("cos"), asc("b"))
    a.join(b, col("a") =!= col("b"))
      .withColumn("cos", dot("ea", "eb") / (col("na") * col("nb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("a"), col("b").as("nn"), col("rank").cast("long").as("rank"), round(col("cos"), 6).as("cos"))
  }

  /** Brute-force cosine top-5 neighbors per vector (the oracle baseline). */
  def llmCosineTopk(spark: SparkSession, sfDir: String): DataFrame =
    cosineTopkCore(spark, sfDir).orderBy("a", "rank")

  /** Majority label among the 5 nearest neighbors; per-label accuracy against
    * the vector's own label. Vote ties break by (count desc, label asc). */
  def llmKnnLabel(spark: SparkSession, sfDir: String): DataFrame = {
    val topk = cosineTopkCore(spark, sfDir)
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

  /** Embedding near-duplicate pairs: cosine ≥ 0.95, blocked by label (at
    * 100 TB the block key becomes an LSH/IVF cell). */
  def llmEmbedNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    val a = emb(spark, sfDir).select(col("vec_id").as("a"), col("label"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = emb(spark, sfDir).select(col("vec_id").as("b"), col("label").as("label2"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("label") === col("label2") && col("a") < col("b"))
      .withColumn("cos", dot("ea", "eb") / (col("na") * col("nb")))
      .filter(col("cos") >= 0.95)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
      .orderBy("a", "b")
  }

  /** IVF-style ANN: coarse cells = per-label centroids; each vector indexes
    * into its nearest cell and probes the 3 nearest cells at query time;
    * top-5 by cosine within probed candidates. Rows-only (approximate —
    * LlmSpec measures recall vs the brute-force baseline). */
  def llmAnnIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val centroids = e
      .select(col("label").as("cell"), posexplode(col("embedding")))
      .toDF("cell", "pos", "v")
      .groupBy("cell", "pos").agg(avg("v").as("cv"))
      .groupBy("cell").agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pairs"))
      .select(col("cell"), transform(col("pairs"), p => p.getField("cv").cast("float")).as("centroid"))
      // norm once per centroid BEFORE the broadcast, not once per (vector, cell) pair
      .withColumn("centroid_nrm", norm("centroid"))
    val withCells = e.crossJoin(broadcast(centroids))
      .withColumn("dist2cell", dot("embedding", "centroid") /
        (col("nrm") * col("centroid_nrm")))
    val wCell = Window.partitionBy("vec_id").orderBy(desc("dist2cell"), asc("cell"))
    val ranked = withCells.withColumn("cell_rank", row_number().over(wCell))
    val indexed = ranked.filter(col("cell_rank") === 1)
      .select(col("vec_id").as("b"), col("cell"), col("embedding").as("eb"), col("nrm").as("nb"))
    val probes = ranked.filter(col("cell_rank") <= 3)
      .select(col("vec_id").as("a"), col("cell"), col("embedding").as("ea"), col("nrm").as("na"))
    val w = Window.partitionBy("a").orderBy(desc("cos"), asc("b"))
    probes.join(indexed, Seq("cell"))
      .filter(col("a") =!= col("b"))
      .withColumn("cos", dot("ea", "eb") / (col("na") * col("nb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("a"), col("b").as("nn"), col("rank").cast("long").as("rank"), round(col("cos"), 6).as("cos"))
      .orderBy("a", "rank")
  }

  /** Multimodal plumbing: documents as opaque binary payloads with typed
    * metadata; features here are deterministic (byte length + md5) so the
    * pipeline is oracle-checkable end-to-end. The decode stage a real
    * deployment would run (image/audio libs absent in this container) is
    * stubbed in MultimodalOps.decodeStub and exercised by its spec. */
  def llmMultimodalFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("meta", struct(col("lang"), col("n_chars")))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        col("meta.lang").as("meta_lang"))
      .orderBy("doc_id")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_cosine_topk" -> llmCosineTopk,
    "llm_knn_label" -> llmKnnLabel,
    "llm_embed_neardup" -> llmEmbedNeardup,
    "llm_ann_ivf" -> llmAnnIvf,
    "llm_multimodal_features" -> llmMultimodalFeatures,
  )

  private val cosSql =
    """list_aggregate(list_transform(list_zip(ea.embedding, eb.embedding),
      |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
      |  / (sqrt(list_aggregate(list_transform(ea.embedding,
      |       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
      |   * sqrt(list_aggregate(list_transform(eb.embedding,
      |       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))""".stripMargin

  val oracles: Map[String, String] = Map(
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
    "llm_knn_label" ->
      s"""WITH pairs AS (
         |  SELECT ea.vec_id AS a, eb.vec_id AS b,
         |    $cosSql AS cos
         |  FROM embeddings ea JOIN embeddings eb ON ea.vec_id <> eb.vec_id),
         |topk AS (
         |  SELECT a, b FROM (
         |    SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY cos DESC, b ASC) AS rank
         |    FROM pairs) WHERE rank <= 5),
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
         |WHERE cos >= 0.95 ORDER BY a, b""".stripMargin,
    // llm_ann_ivf: approximate — spec-checked recall vs brute force, no oracle.
    "llm_multimodal_features" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS payload_md5, lang AS meta_lang
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}

package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Scalar function groups (SURVEY.md §2.8): string / regexp / date / math /
  * array / generator / map / json.
  *
  * Cross-engine parity notes (each pinned by the oracle):
  *  - DuckDB `regexp_replace` replaces the FIRST match unless passed the 'g'
  *    flag; Spark always replaces all — oracle uses 'g'.
  *  - Day-of-week origins differ (Spark dayofweek 1=Sun, DuckDB 0=Sun); we use
  *    ISO numbering built from Spark's weekday() (0=Mon) + 1 ≡ DuckDB isodow.
  *  - Month difference is computed with explicit (year*12+month) arithmetic —
  *    identical integers on both engines, avoiding months_between /
  *    date_diff('month') semantic gaps.
  *  - Spark floor/ceil return LONG and sign returns DOUBLE; both are cast so
  *    output dtypes match DuckDB's.
  *  - All libm-backed doubles (ln/log10/pow) are rounded to 6 decimals.
  *
  * Scale: all scalar work is per-row inside whole-stage codegen — no shuffle
  * except the final determinism orderBy.
  */
object ScalarFuncs {

  def strFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        lower(col("c_name")).as("name_lower"),
        trim(concat_ws(" ", lit(" x"), col("c_mktsegment"))).as("seg_trim"),
        substring(col("c_name"), 1, 8).as("name_pfx"),
        length(col("c_name")).cast("long").as("name_len"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_pad"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_trans"),
        regexp_replace(col("c_name"), lit("Customer"), lit("Cust")).as("name_short"))
      .orderBy("c_custkey")

  def strRegexp(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .filter(col("p_name").rlike("[aeiou]{2}"))
      .select(col("p_partkey"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), "\\d", "#").as("name_masked"))
      .orderBy("p_partkey")

  def dateFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        (expr("weekday(o_orderdate)") + 1).cast("long").as("iso_dow"),
        date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("grace_date"),
        ((lit(2002) - year(col("o_orderdate"))) * 12 + (lit(1) - month(col("o_orderdate")))).cast("long").as("months_to_2002"))
      .orderBy("o_orderkey")

  def mathFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        round(col("p_retailprice"), 1).as("price_r1"),
        floor(col("p_retailprice")).cast("double").as("price_floor"),
        ceil(col("p_retailprice")).cast("double").as("price_ceil"),
        abs(col("p_retailprice") - 1000.0).as("dist_1000"),
        round(sqrt(col("p_retailprice")), 6).as("price_sqrt"),
        round(log(col("p_retailprice")), 6).as("price_ln"),
        round(log10(col("p_retailprice")), 6).as("price_log10"),
        round(pow(col("p_size").cast("double"), 2.0), 6).as("size_sq"),
        signum(col("p_retailprice") - 1000.0).cast("int").as("sign_1000"),
        greatest(col("p_retailprice"), col("p_size").cast("double")).as("gmax"),
        least(col("p_retailprice"), col("p_size").cast("double")).as("gmin"))
      .orderBy("p_partkey")

  def arrayFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("tokens", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("tokens")).cast("long").as("n_tokens"),
        size(array_distinct(col("tokens"))).cast("long").as("n_distinct"),
        array_contains(col("tokens"), "hash").as("has_hash"),
        // comma-joined, not a bare array: the driver comparator can't hash arrays
        array_join(slice(array_sort(array_distinct(col("tokens"))), 1, 5), ",").as("first5"),
        aggregate(col("tokens"), lit(0L), (acc, x) => acc + length(x)).as("sum_len"),
        size(filter(col("tokens"), x => length(x) > 4)).cast("long").as("n_long"))
      .orderBy("doc_id")

  /** Generator: explode tokens → corpus-wide term frequency. */
  def explodeTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("tf"))
      .orderBy("token")

  /** Map construction + access (map_from_arrays AND str_to_map); output
    * flattened to SQL-comparable rows. */
  def mapFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("m", map_from_arrays(array(lit("k")), array(col("k_val"))))
      .withColumn("m2", expr("str_to_map(concat('k=', CAST(k_val AS STRING)), ',', '=')"))
      .select(col("event_id"),
        size(map_keys(col("m"))).as("n_keys"),
        element_at(col("m"), "k").as("k_val"),
        map_contains_key(col("m"), "k").as("has_k"),
        element_at(col("m2"), "k").cast("int").as("k_via_strmap"))
      .orderBy("event_id")

  /** Map higher-order functions (transform_keys / transform_values /
    * map_filter / map_zip_with) over a per-event map built from the JSON
    * payload. The outputs are scalar projections whose expected values the
    * oracle computes directly from k, so parity doesn't depend on a map
    * literal representation. (Per-row lambdas run interpreted — fine for
    * map-typed config/feature columns, which are dimension-ish by nature;
    * hot fact-table array pipelines use native expressions instead, see
    * graft_hashed_shingles.) */
  def mapHofFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("m", map_from_arrays(array(lit("a"), lit("b")), array(col("k"), col("k") * 2)))
      .select(col("event_id"),
        element_at(transform_values(col("m"), (_, v) => v + 1), "a").as("va_plus1"),
        size(map_filter(col("m"), (_, v) => v % 2 === 0)).as("n_even"),
        element_at(map_zip_with(col("m"), col("m"), (_, v1, v2) => v1 + v2), "b").as("zb"),
        map_contains_key(transform_keys(col("m"), (key, _) => upper(key)), "A").as("has_upper_a"))
      .orderBy("event_id")

  def jsonFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(spark, sfDir)
      .withColumn("parsed", from_json(col("props"), schema))
      .groupBy("event_type")
      .agg(round(avg(col("parsed").getField("k")), 4).as("avg_k"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
      .orderBy("event_type")
  }

  /** Semi-structured props via Spark 4's VARIANT type — the engine-native
    * successor to string-JSON paths: `parse_json` converts each props
    * string ONCE into the binary variant encoding, and `variant_get`
    * extracts typed fields from that encoding without re-parsing text —
    * at 100 TB the difference between one parse per row and one parse
    * per extraction, and the representation Delta/Iceberg's variant
    * columns shred into. Same events.props field as `json_funcs` (that
    * row keeps the classic from_json/get_json_object surface); the
    * DuckDB oracle replays the extraction with its JSON functions since
    * the VALUES are representation-independent. */
  def jsonVariant(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("v", parse_json(col("props")))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  /** Edit distance (levenshtein) against a reference key format. */
  def strDistance(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        levenshtein(col("c_name"), lit("Customer#000000001")).cast("long").as("lev_ref"),
        levenshtein(lower(col("c_mktsegment")), lit("building")).cast("long").as("lev_seg"))
      .orderBy("c_custkey")

  /** Array set algebra: union/intersect/except of the two halves of each
    * doc's token list (sorted so element order is engine-independent). */
  def arraySetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(lower(trim(col("text"))), " ")
    Tables.documents(spark, sfDir)
      // floor-div on both engines (cast-of-double rounds in DuckDB but
      // truncates in Spark — floor first makes them agree on odd counts)
      .withColumn("half", floor(size(toks) / 2).cast("int"))
      .withColumn("h1", array_distinct(slice(toks, lit(1), col("half"))))
      .withColumn("h2", array_distinct(slice(toks, col("half") + 1, size(toks))))
      .select(col("doc_id"),
        // comma-joined, not bare arrays: the driver comparator can't hash arrays
        array_join(array_sort(array_union(col("h1"), col("h2"))), ",").as("u"),
        array_join(array_sort(array_intersect(col("h1"), col("h2"))), ",").as("i"),
        array_join(array_sort(array_except(col("h1"), col("h2"))), ",").as("d"))
      .orderBy("doc_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "str_distance" -> strDistance,
    "array_set_ops" -> arraySetOps,
    "str_funcs" -> strFuncs,
    "str_regexp" -> strRegexp,
    "date_funcs" -> dateFuncs,
    "math_funcs" -> mathFuncs,
    "array_funcs" -> arrayFuncs,
    "explode_tokens" -> explodeTokens,
    "map_funcs" -> mapFuncs,
    "map_hof_funcs" -> mapHofFuncs,
    "json_funcs" -> jsonFuncs,
    "json_variant" -> jsonVariant,
  )

  val oracles: Map[String, String] = Map(
    "str_distance" ->
      """SELECT c_custkey,
        |  CAST(levenshtein(c_name, 'Customer#000000001') AS BIGINT) AS lev_ref,
        |  CAST(levenshtein(lower(c_mktsegment), 'building') AS BIGINT) AS lev_seg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "array_set_ops" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(toks[:CAST(floor(len(toks) / 2) AS INT)]) AS h1,
        |    list_distinct(toks[CAST(floor(len(toks) / 2) AS INT) + 1:]) AS h2
        |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
        |        FROM documents))
        |SELECT doc_id,
        |  coalesce(array_to_string(list_sort(list_distinct(list_concat(h1, h2))), ','), '') AS u,
        |  coalesce(array_to_string(list_sort(list_filter(h1, x -> list_contains(h2, x))), ','), '') AS i,
        |  coalesce(array_to_string(list_sort(list_filter(h1, x -> NOT list_contains(h2, x))), ','), '') AS d
        |FROM d ORDER BY doc_id""".stripMargin,
    "str_funcs" ->
      """SELECT c_custkey,
        |  upper(c_name) AS name_upper,
        |  lower(c_name) AS name_lower,
        |  trim(concat_ws(' ', ' x', c_mktsegment)) AS seg_trim,
        |  substring(c_name, 1, 8) AS name_pfx,
        |  length(c_name) AS name_len,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_trans,
        |  replace(c_name, 'Customer', 'Cust') AS name_short
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "str_regexp" ->
      """SELECT p_partkey,
        |  regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
        |  regexp_replace(p_name, '\d', '#', 'g') AS name_masked
        |FROM part WHERE regexp_matches(p_name, '[aeiou]{2}')
        |ORDER BY p_partkey""".stripMargin,
    "date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  quarter(o_orderdate) AS q,
        |  month(o_orderdate) AS m,
        |  day(o_orderdate) AS dom,
        |  isodow(o_orderdate) AS iso_dow,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS grace_date,
        |  (2002 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)) AS months_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "math_funcs" ->
      """SELECT p_partkey,
        |  round(p_retailprice, 1) AS price_r1,
        |  floor(p_retailprice) AS price_floor,
        |  ceil(p_retailprice) AS price_ceil,
        |  abs(p_retailprice - 1000.0) AS dist_1000,
        |  round(sqrt(p_retailprice), 6) AS price_sqrt,
        |  round(ln(p_retailprice), 6) AS price_ln,
        |  round(log10(p_retailprice), 6) AS price_log10,
        |  round(pow(CAST(p_size AS DOUBLE), 2.0), 6) AS size_sq,
        |  CAST(sign(p_retailprice - 1000.0) AS INT) AS sign_1000,
        |  greatest(p_retailprice, CAST(p_size AS DOUBLE)) AS gmax,
        |  least(p_retailprice, CAST(p_size AS DOUBLE)) AS gmin
        |FROM part ORDER BY p_partkey""".stripMargin,
    "array_funcs" ->
      """SELECT doc_id,
        |  len(tokens) AS n_tokens,
        |  len(list_distinct(tokens)) AS n_distinct,
        |  list_contains(tokens, 'hash') AS has_hash,
        |  coalesce(array_to_string(list_sort(list_distinct(tokens))[:5], ','), '') AS first5,
        |  CAST(list_aggregate(list_transform(tokens, x -> length(x)), 'sum') AS BIGINT) AS sum_len,
        |  len(list_filter(tokens, x -> length(x) > 4)) AS n_long
        |FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "explode_tokens" ->
      """SELECT token, count(*) AS tf
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY token""".stripMargin,
    "map_hof_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) + 1 AS va_plus1,
        |  CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) % 2 = 0
        |       THEN 2 ELSE 1 END AS n_even,
        |  4 * CAST(json_extract_string(props, '$.k') AS INT) AS zb,
        |  true AS has_upper_a
        |FROM events ORDER BY event_id""".stripMargin,
    "map_funcs" ->
      """SELECT event_id, 1 AS n_keys,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        |  true AS has_k,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_via_strmap
        |FROM events ORDER BY event_id""".stripMargin,
    "json_variant" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "json_funcs" ->
      """SELECT event_type,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 / builder prompt: "salting for
  * skew").
  *
  * AQE's skew-join split handles most sort-merge skew automatically; salting
  * is the explicit fallback for the pathological case — a handful of hot keys
  * (one customer = 5% of a 100 TB fact table) that would pin single tasks.
  * The fact side gets a uniform pseudo-salt; the (small) build side is
  * replicated once per salt value, so each hot key fans out over `salt`
  * tasks. Join RESULTS are salt-invariant — only the physical distribution
  * changes — which SkewSpec asserts.
  */
object Skew {

  /** Inner equi-join of `fact` (potentially skewed on `key`) with the small
    * `build` side, salted `salt` ways. `build` must be unique per key (a
    * dimension), since it is replicated. */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val salts = array((0 until salt).map(lit): _*)
    // Collision-proof generated column name: a fact/build column literally
    // named like our salt column must not be silently joined on or dropped.
    val saltCol = {
      var c = "__graft_salt"
      while (fact.columns.contains(c) || build.columns.contains(c)) c += "_"
      c
    }
    // Salt assignment only affects placement, never the result: a per-row
    // uniform draw, NOT a hash of every fact column (which fails analysis on
    // unhashable column types such as MapType). A hot key fans out over all
    // `salt` buckets regardless of its payload.
    val saltedFact = fact.withColumn(saltCol, (rand(42) * salt).cast("int"))
    val repBuild = build.withColumn(saltCol, explode(salts))
    saltedFact.join(repBuild, Seq(key, saltCol), "inner").drop(saltCol)
  }
}

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
    // salt assignment only affects placement, never the result; derive it
    // from the full fact row hash so it needs no extra state
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
    val repBuild = build.withColumn("__salt", explode(salts))
    saltedFact.join(repBuild, Seq(key, "__salt"), "inner").drop("__salt")
  }
}

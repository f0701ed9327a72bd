package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant checks for the round-12 additions that no oracle can see:
  * the binary-search membership kernel behind deletion-vector application
  * (codegen + interpreted agreement, boundary behavior). */
class Round12OpsSpec extends SparkSpec {

  test("sorted-contains binary search agrees with array_contains (codegen + interpreted)") {
    graft.functions.SortedContainsExprs.register(spark)
    // codegen path over a real plan: every position in and around a sorted
    // array, including duplicates and both ends
    val rows = spark.range(-2, 13)
      .selectExpr(
        "id AS v",
        "graft_sorted_contains(array(0L, 1L, 3L, 3L, 7L, 10L), id) AS bs",
        "array_contains(array(0L, 1L, 3L, 3L, 7L, 10L), id) AS lin")
      .collect()
    rows.foreach(r => assert(r.getBoolean(1) === r.getBoolean(2),
      s"mismatch at v=${r.getLong(0)}"))
    // empty array finds nothing; null array / null needle stay null
    val edge = spark.range(1).selectExpr(
      "graft_sorted_contains(CAST(array() AS ARRAY<LONG>), 1L) AS e",
      "graft_sorted_contains(CAST(NULL AS ARRAY<LONG>), 1L) AS na",
      "graft_sorted_contains(array(1L), CAST(NULL AS LONG)) AS nv").head
    assert(!edge.getBoolean(0))
    assert(edge.isNullAt(1) && edge.isNullAt(2))
    // interpreted path (direct eval, no codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val arr = Literal.create(
      new GenericArrayData(Array[Any](0L, 1L, 3L, 3L, 7L, 10L)),
      ArrayType(LongType, containsNull = false))
    val e = graft.functions.SortedContains(arr, Literal(7L))
    assert(e.eval(null) === true)
    assert(graft.functions.SortedContains(arr, Literal(8L)).eval(null) === false)
  }

  test("dv read via per-file binary search equals the plain predicate filter") {
    // semantic pin at a SECOND scale factor (the oracle replays sf0.01):
    // the unexploded-broadcast + sorted-contains read must keep exactly
    // the rows a plain WHERE NOT predicate keeps
    val root = Sinks.dvWriteData(spark, sf001)
    Sinks.dvDelete(spark, root)
    val viaDv = Sinks.dvRead(spark, root)
      .select("l_orderkey", "l_linenumber")
    val expected = graft.Tables.lineitem(spark, sf001)
      .filter(!Sinks.dvDeletePredicate)
      .select("l_orderkey", "l_linenumber")
    assert(viaDv.exceptAll(expected).isEmpty && expected.exceptAll(viaDv).isEmpty,
      "merge-on-read result must equal the logical delete")
  }
}

package graft

/** Driver-contract invariants: entry() smoke, query/oracle key alignment. */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names/aliases stay aligned") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle keys without queries: ${os -- qs}")
    // every query runs and yields a non-degenerate schema on smoke data
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }
}

package graft.queries

import graft.SparkSpec

/** The differential fuzzer's in-suite arm (round-18 verdict #3): 60
  * seeded random operator compositions ([[Fuzz.compose]] — null-heavy
  * joins, fills, windows, aggs, semi/anti, distinct over the real
  * testdata tables), each executed through BOTH session entry paths —
  * the Column API and its generated SQL twin via `spark.sql` — and
  * compared row for row under the composition's own total order. Any
  * failure is a reproducible seed; a divergence is either an engine
  * bug to fix or a dialect difference to pin in [[Fuzz]]'s guardrail
  * list. The cross-ENGINE arm of the same generator is the
  * `fuzz_differential` board gate (seeds 1..12 vs DuckDB through the
  * driver's hash compare). */
class FuzzSpec extends SparkSpec {

  private def registerTables(): Unit =
    Seq("documents", "events", "customer", "orders", "nation").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").createOrReplaceTempView(t)
    }

  private def cell(v: Any): String = v match {
    case null => "∅"
    case n: Number => n.longValue.toString // int/long/decimal-free surface
    case x => x.toString
  }

  test("differential fuzz: 60 seeded operator compositions agree " +
       "between the Column API and Spark SQL, row for row") {
    registerTables()
    val failures = (1L to 60L).flatMap { seed =>
      val c = Fuzz.compose(seed)
      try {
        val viaDf = c.df(spark, sf).collect().map(_.toSeq.map(cell))
        val viaSql = spark.sql(c.sql).collect().map(_.toSeq.map(cell))
        if (viaDf.length != viaSql.length)
          Some(s"seed $seed: ${viaDf.length} vs ${viaSql.length} rows")
        else viaDf.zip(viaSql).zipWithIndex.collectFirst {
          case ((a, b), i) if a != b => s"seed $seed row $i: $a vs $b"
        }
      } catch {
        case e: Exception =>
          Some(s"seed $seed: ${e.getMessage.linesIterator.next()}\n${c.sql}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("fuzz compositions are non-trivial: most seeds return rows and " +
       "several compose 5+ stages") {
    registerTables()
    val sizes = (1L to 60L).map(seed =>
      Fuzz.compose(seed).df(spark, sf).count())
    assert(sizes.count(_ > 0) >= 45,
      s"fixture strength: ${sizes.count(_ > 0)}/60 seeds non-empty")
    val deep = (1L to 60L).count(s => Fuzz.compose(s).sql.count(_ == '(') >= 8)
    assert(deep >= 10, s"only $deep/60 compositions are deep")
  }
}

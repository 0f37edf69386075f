package graft

import graft.ops.{ColumnOps, Imputation}
import graft.metrics.Psi
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (FIXTURES.md §7) over the ops library.
  * Raw ScalaCheck generators with fixed seeds (the scalatest-scalacheck
  * bridge isn't in the offline cache); 8 samples per property — each
  * check is a full Spark job.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int = 8): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("parseEmpLength never throws; non-null input never yields null") {
    val gen = Gen.listOfN(20, Gen.oneOf(
      Gen.alphaNumStr, Gen.const("10+ years"), Gen.const("< 1 year"),
      Gen.const("missing"), Gen.chooseNum(0, 99).map(n => s"$n years"),
      Gen.const(""), Gen.const("  7 YEARS  ")))
    samples(gen).foreach { xs =>
      val out = xs.toDF("e")
        .select(ColumnOps.parseEmpLength($"e").as("v")).collect()
      assert(out.forall(!_.isNullAt(0)))
      xs.zip(out.map(_.getInt(0))).foreach {
        case ("10+ years", v) => assert(v == 10)
        case ("< 1 year", v)  => assert(v == 0)
        case ("missing", v)   => assert(v == -1)
        case ("  7 YEARS  ", v) => assert(v == 7) // trim + lower + digits
        case _ => ()
      }
    }
  }

  test("oneHot: row sum is 1 for in-dictionary values, 0 otherwise") {
    val cats = Seq("A", "B", "C")
    val gen = Gen.nonEmptyListOf(Gen.oneOf("A", "B", "C", "D", "zz", ""))
    samples(gen).foreach { xs =>
      val out = xs.toDF("c")
        .select($"c" +: ColumnOps.oneHot("c", cats): _*).collect()
      out.foreach { r =>
        val s = (1 to cats.size).map(r.getInt).sum
        assert(s == (if (cats.contains(r.getString(0))) 1 else 0))
      }
    }
  }

  test("modesOf agrees with naive per-column mode on random data") {
    val gen = for {
      is <- Gen.listOfN(30, Gen.chooseNum(0, 5))
      ss <- Gen.listOfN(30, Gen.oneOf("x", "y", "z"))
    } yield is.zip(ss)
    samples(gen).foreach { rows =>
      val df = rows.toDF("i", "s")
      val modes = Imputation.modesOf(df, Seq("i", "s")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      def naive(vals: Seq[String]): String =
        vals.groupBy(identity).toSeq
          .sortBy { case (v, g) => (-g.size, v) }.head._1
      assert(modes("i") == naive(rows.map(_._1.toString)))
      assert(modes("s") == naive(rows.map(_._2)))
    }
  }

  test("PSI is non-negative and zero on identical distributions") {
    val gen = for {
      as <- Gen.listOfN(50, Gen.chooseNum(-100.0, 100.0))
      bs <- Gen.listOfN(50, Gen.chooseNum(-100.0, 100.0))
    } yield (as, bs)
    samples(gen, 4).foreach { case (as, bs) =>
      val e = as.toDF("v"); val a = bs.toDF("v")
      val psi = Psi.psi(e, a, "v").as[Double].first()
      assert(psi >= -1e-12, s"psi $psi negative")
      val self = Psi.psi(e, e, "v").as[Double].first()
      assert(math.abs(self) < 1e-9)
    }
  }

  test("grade labelMap is a bijection A-G <-> 0-6 and null off-domain") {
    import graft.pipeline.Schemas
    val gen = Gen.nonEmptyListOf(
      Gen.oneOf("A", "B", "C", "D", "E", "F", "G", "H", "@"))
    samples(gen).foreach { xs =>
      val out = xs.toDF("g")
        .select($"g", ColumnOps.labelMap($"g", Schemas.gradeMapping).as("v")).collect()
      out.foreach { r =>
        val g = r.getString(0)
        if (g >= "A" && g <= "G") assert(r.getInt(1) == g.head - 'A')
        else assert(r.isNullAt(1))
      }
    }
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks — the gate the reference declares a dependency
  * for but never wires up (great-expectations in requirements.txt:29 is
  * imported by no module; SURVEY §5). Each check returns a one-row
  * DataFrame (check, violations, passed) and is a single aggregation
  * pass over its table: uniqueness is count-minus-distinct, referential
  * integrity is an anti-join count (null child keys are not violations,
  * standard FK semantics), ranges and not-null are conditional counts.
  * Compose with `report` to union many checks into one result table —
  * each check stays an independent job, so a failed scan in one cannot
  * poison the others.
  */
object Quality {

  private def row(df: DataFrame, check: String, violations: Column): DataFrame =
    df.agg(violations.cast("long").as("violations"))
      .select(lit(check).as("check"), col("violations"),
        (col("violations") === 0).as("passed"))

  /** No duplicate values over `cols`. Nulls group like values — two
    * null keys count as one duplicate, STRICTER than SQL
    * `count(DISTINCT col)` which drops nulls entirely (null-key
    * presence is `notNullCheck`'s job; this check answers "is the key
    * set collision-free"). */
  def uniqueCheck(df: DataFrame, cols: Seq[String], name: String): DataFrame =
    row(df, name,
      count(lit(1)) - countDistinct(struct(cols.map(col): _*)))

  /** No nulls in `c`. */
  def notNullCheck(df: DataFrame, c: String, name: String): DataFrame =
    row(df, name, count(when(col(c).isNull, 1)))

  /** Every value of `c` inside [lo, hi]. */
  def rangeCheck(df: DataFrame, c: String, lo: Double, hi: Double,
                 name: String): DataFrame =
    row(df, name, count(when(col(c) < lo || col(c) > hi, 1)))

  /** Referential integrity: every non-null child key exists in the
    * parent. Anti-join on the key — the parent key set broadcasts when
    * small, and the count never materializes the violating rows. */
  def fkCheck(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String, name: String): DataFrame =
    row(
      child.filter(col(childKey).isNotNull)
        .join(parent.select(col(parentKey).as(childKey)),
          Seq(childKey), "left_anti"),
      name, count(lit(1)))

  /** Union of independent checks into one (check, violations, passed)
    * table, ordered by check name. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    checks.reduce(_ unionByName _).orderBy("check")
  }
}

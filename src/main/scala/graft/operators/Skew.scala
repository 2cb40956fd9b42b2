package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §5: "skewed keys → salting or AQE
  * skew-join"). AQE's runtime skew-join split handles sort-merge joins;
  * salting is the explicit tool for aggregations and joins where one key
  * dominates (a single giant customer, one boilerplate document cluster).
  */
object Skew {

  /** Salted equi-join for a skewed LEFT side: the left's rows spread
    * across `saltFactor` sub-keys (deterministic hash of all columns, so
    * repeated runs salt identically), the (small-ish) right side is
    * replicated `saltFactor` times. Result equals `left.join(right,
    * keys)` exactly; each hot key's rows now land on `saltFactor`
    * partitions instead of one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(hash(left.columns.map(col).toSeq: _*), lit(saltFactor)))
    val replicated = right.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase (salted partial + final) aggregation for skewed groupBy
    * keys: phase 1 aggregates on (keys, salt) — spreading a hot key over
    * `saltFactor` reducers — phase 2 merges the partials. `partials`
    * maps each output column to its phase-1 aggregate; `merges` to the
    * phase-2 re-aggregate of the partial column. Counts/sums merge with
    * sum, min/max with min/max. */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
                partials: Seq[(String, Column)], merges: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.map(col).toSeq: _*), lit(saltFactor)))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merges.head._2.as(merges.head._1),
        merges.tail.map { case (n, c) => c.as(n) }: _*)
  }
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture operators: snapshot diffing and slowly-changing-
  * dimension (SCD type-2) merges.
  *
  * The reference loads day tables with replace/append dispositions
  * (`Google_Bigquery.upload`); the natural next questions — "what
  * changed between yesterday's extract and today's?" and "keep the full
  * attribute history, not just the latest row" — are these two
  * operators. Both are pure joins/unions on the business key, so they
  * shuffle once per input on the key and inherit bucketing/broadcast
  * freedom from Catalyst.
  */
object Cdc {

  /** Row-level diff of two snapshots of the same logical table.
    *
    * Full-outer join on the key; each surviving row is classified
    * `added` / `removed` / `changed` (tracked columns compared
    * NULL-SAFELY — a null→value transition is a change, not a match).
    * Unchanged rows are dropped, so output size tracks churn, not table
    * size. Output carries old_/new_ copies of every tracked column.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String], trackedCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(trackedCols.nonEmpty, "snapshotDiff needs at least one tracked column")
    val o = oldDf.select((keyCols ++ trackedCols).map(col): _*).as("o")
    val n = newDf.select((keyCols ++ trackedCols).map(col): _*).as("n")
    val keyEq = keyCols.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val sameTracked = trackedCols.map(c => col(s"o.$c") <=> col(s"n.$c")).reduce(_ && _)
    val inOld = keyCols.map(k => col(s"o.$k").isNotNull).reduce(_ && _)
    val inNew = keyCols.map(k => col(s"n.$k").isNotNull).reduce(_ && _)
    o.join(n, keyEq, "full_outer")
      .withColumn("change_type",
        when(!inOld, lit("added"))
          .when(!inNew, lit("removed"))
          .when(!sameTracked, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(
        keyCols.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k)) ++
          Seq(col("change_type")) ++
          trackedCols.map(c => col(s"o.$c").as(s"old_$c")) ++
          trackedCols.map(c => col(s"n.$c").as(s"new_$c")): _*)
  }

  /** `q61_snapshot_diff`: two deterministic snapshots derived from the
    * orders table (old = keys not ≡0 mod 10; new = keys not ≡0 mod 7,
    * with a flat 10.00 rebate for keys ≡0 mod 3 — a SUBTRACTION, not a
    * scaled round: `round(x*0.9, 2)` lands on half-cent ties where the
    * engines' double rounding can disagree) → full diff. */
  def snapshotDiffOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val oldSnap = orders.filter(col("o_orderkey") % 10 =!= 0)
    val newSnap = orders.filter(col("o_orderkey") % 7 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 3 === 0, col("o_totalprice") - 10.0)
          .otherwise(col("o_totalprice")))
    snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"), Seq("o_totalprice", "o_orderstatus"))
      .withColumn("old_o_totalprice", round(col("old_o_totalprice"), 4))
      .withColumn("new_o_totalprice", round(col("new_o_totalprice"), 4))
      .transform(d => Perf.sortedOnce(d, col("o_orderkey")))
  }

  /** SCD type-2 merge: apply an update batch to a versioned dimension.
    *
    * `dim` carries (keys, tracked attrs, `valid_from`, `valid_to` —
    * null marks the current version). `updates` carries (keys, tracked
    * attrs, `effCol`). Per key:
    *  - update with changed attrs → current row CLOSES (`valid_to` =
    *    effective ts) and a new open version appends;
    *  - update with identical attrs → no-op (idempotent re-delivery);
    *  - unknown key → brand-new open version;
    *  - keys without updates, and all closed history rows, pass through.
    *
    * Multiple updates per key in one batch collapse to the LATEST by
    * `effCol` first (the Alodesk keep-latest rule) — applying a batch
    * once equals applying its days one at a time only for the final
    * state, which is the disposition semantics sinks actually need.
    * Updates effective BEFORE a key's current `valid_from` are rejected
    * loudly: silently closing a version with `valid_to < valid_from`
    * would corrupt the interval invariant every reader depends on.
    */
  def scd2Merge(dim: DataFrame, updates: DataFrame,
                keyCols: Seq[String], trackedCols: Seq[String],
                effCol: String): DataFrame = {
    require(keyCols.nonEmpty && trackedCols.nonEmpty, "keys and tracked attrs required")
    val outCols = (keyCols ++ trackedCols ++ Seq("valid_from", "valid_to")).map(col)
    val byKeyLatest = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(effCol).desc)
    val latest = updates
      .withColumn("_rn", row_number().over(byKeyLatest))
      .filter(col("_rn") === 1).drop("_rn")
      .as("u")
    val current = dim.filter(col("valid_to").isNull).as("c")
    val history = dim.filter(col("valid_to").isNotNull).select(outCols: _*)
    val keyEq = keyCols.map(k => col(s"c.$k") === col(s"u.$k")).reduce(_ && _)
    val sameTracked = trackedCols.map(c => col(s"c.$c") <=> col(s"u.$c")).reduce(_ && _)
    val hasCur = keyCols.map(k => col(s"c.$k").isNotNull).reduce(_ && _)
    val hasUpd = keyCols.map(k => col(s"u.$k").isNotNull).reduce(_ && _)
    val joined = current.join(latest, keyEq, "full_outer")
      // interval-invariant guard: declarative raise_error so the check
      // runs distributed, inside the same join pass
      .withColumn("_eff",
        when(hasCur && hasUpd && !sameTracked && col(s"u.$effCol") <= col("c.valid_from"),
          raise_error(concat(lit("scd2Merge: update effective "),
            col(s"u.$effCol").cast("string"),
            lit(" not after current valid_from "),
            col("c.valid_from").cast("string"))))
          .otherwise(col(s"u.$effCol")))
    // ONE pass over the join: each row emits its result rows (1 for
    // kept/insert, 2 for close+reopen) as an exploded struct array —
    // three filtered branches here tripled the join in the physical
    // plan (and the dim scans with it)
    def leg(side: String, from: Column, to: Column) = struct(
      keyCols.map(k => col(s"$side.$k").as(k)) ++
        trackedCols.map(c => col(s"$side.$c").as(c)) ++
        Seq(from.as("valid_from"), to.as("valid_to")): _*)
    val nullTo = lit(null).cast(dim.schema("valid_to").dataType)
    val emitted =
      when(hasCur && (!hasUpd || sameTracked),
        array(leg("c", col("c.valid_from"), col("c.valid_to"))))
        .when(hasCur && hasUpd && !sameTracked,
          array(leg("c", col("c.valid_from"), col("_eff")),
            leg("u", col("_eff"), nullTo)))
        .otherwise(array(leg("u", col("_eff"), nullTo)))
    history.unionByName(joined.select(explode(emitted).as("_r")).select(col("_r.*")))
  }

  /** `q62_scd2_merge`: customer market segments as a versioned
    * dimension; a deterministic update batch re-segments keys ≡0 mod 5
    * and inserts new keys (customer key + 10^6 for keys ≡1 mod 97). */
  def scd2Customers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir).customer.select(col("c_custkey"), col("c_mktsegment"))
    val dim = c
      .withColumn("valid_from", lit("2024-01-01").cast("date"))
      .withColumn("valid_to", lit(null).cast("date"))
    val resegmented = c.filter(col("c_custkey") % 5 === 0)
      .withColumn("c_mktsegment", concat(col("c_mktsegment"), lit("_V2")))
    val inserts = c.filter(col("c_custkey") % 97 === 1)
      .withColumn("c_custkey", col("c_custkey") + lit(1000000L))
    val updates = resegmented.unionByName(inserts)
      .withColumn("eff", lit("2024-06-01").cast("date"))
    // open intervals surface as the warehouse high-date here (null is
    // the library-level representation, but a null DATE round-trips as
    // None vs NaT across the two oracle engines' pandas frames)
    scd2Merge(dim, updates, Seq("c_custkey"), Seq("c_mktsegment"), "eff")
      .withColumn("valid_to", coalesce(col("valid_to"), lit("9999-12-31").cast("date")))
      .transform(d => Perf.sortedOnce(d, col("c_custkey"), col("valid_from")))
  }
}

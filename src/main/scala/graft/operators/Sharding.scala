package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-corpus layout operators: deterministic shuffling, sharding,
  * and splits. An LLM data build needs all three to be REPRODUCIBLE
  * (same inputs + seed ⇒ identical shard MEMBERSHIP and read order;
  * see the [[writeShards]] scaladoc for exactly what is and isn't
  * byte-stable) and driver-free — no `rand()` (re-evaluates per task
  * retry, breaking determinism under failure), no collect, no global
  * sort bottleneck beyond the one intended shuffle.
  *
  * The primitive is a seeded 64-bit hash of a stable id column
  * (`xxhash64(seed, id)`): uniformly distributed, stable across runs,
  * executors, and retries.
  */
object Sharding {

  /** Seeded stable hash of `id` — the ordering/bucketing primitive. */
  def seededHash(id: Column, seed: Long): Column =
    xxhash64(lit(seed), id)

  /** Deterministic global shuffle + fixed shard layout: rows hash-route
    * to `numShards` shards and sort by the same hash within each, so
    * the corpus READ ORDER (shard by shard, row by row) is a seeded
    * pseudo-random permutation — the training-order shuffle — stable
    * run to run. One shuffle; shard files are bounded by
    * `maxRecordsPerFile`.
    *
    * Determinism contract, precisely: shard MEMBERSHIP (which rows land
    * in which shard=N directory) and the row SEQUENCE a reader sees per
    * shard are functions of (inputs, seed) only — both hashes are
    * seeded and retry-stable. File BOUNDARIES inside a shard directory
    * are not: `repartitionByRange` samples its range bounds with an
    * internal seed derived from the runtime RDD id, so the same write
    * can split a shard's (identically ordered) rows into differently
    * cut files across runs. Consumers that read a shard directory in
    * filename-then-row order see the same row sequence either way;
    * consumers that diff file listings byte-for-byte should not rely
    * on byte-stable files. */
  def writeShards(df: DataFrame, path: String, idCol: String,
                  numShards: Int, seed: Long = 0L,
                  maxRecordsPerFile: Long = 5000000L): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val h = seededHash(col(idCol), seed)
    // range-partition on (shard, order-hash), NOT hash-partition on the
    // shard id: repartition() re-murmurs the shard value, and hashing
    // numShards small ints into numShards buckets collides ~1/e of them
    // — empty tasks next to double-shard stragglers. Contiguous ranges
    // give ~equal ROW counts per task and keep each shard's rows in
    // consecutive tasks; shard CONTENT (what the spec pins) is set by
    // the hash columns either way.
    df.withColumn("shard", pmod(h, lit(numShards)).cast("int"))
      .withColumn("_ord", seededHash(col(idCol), seed + 1))
      .repartitionByRange(numShards, col("shard"), col("_ord"))
      .sortWithinPartitions(col("shard"), col("_ord"))
      .drop("_ord")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(path)
  }

  /** Deterministic weighted split (train/val/test …): each row lands in
    * exactly one named bucket by hash range — reproducible across runs
    * and cluster sizes, unlike `randomSplit` (which is sample-based,
    * partition-order-sensitive, and can drop/duplicate rows across
    * retries). Weights normalize automatically.
    *
    * @return (name → DataFrame) with lazily-filtered views of `df` —
    *         one source scan per materialized split (filter pushdown
    *         applies), no shuffle at all
    */
  def splitByHash(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
                  seed: Long = 0L): Map[String, DataFrame] = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive, got $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"split names must be distinct (a Map result keyed by name), got ${weights.map(_._1)}")
    val total = weights.map(_._2).sum
    // hash → [0, 1): shift into non-negative then scale by 2^63
    val u = (seededHash(col(idCol), seed) / lit(2.0) + lit(Long.MaxValue.toDouble / 2.0 + 1.0)) /
      lit(Long.MaxValue.toDouble + 1.0)
    val cuts = weights.map(_._2 / total).scanLeft(0.0)(_ + _)
    weights.zipWithIndex.map { case ((name, _), i) =>
      val lo = cuts(i); val hi = cuts(i + 1)
      val pred =
        if (i == weights.length - 1) u >= lit(lo)   // last bucket absorbs fp edge
        else u >= lit(lo) && u < lit(hi)
      name -> df.filter(pred)
    }.toMap
  }
}

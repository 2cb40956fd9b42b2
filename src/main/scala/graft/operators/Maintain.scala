package graft.operators

import org.apache.spark.sql.SparkSession

/** The SCHEDULABLE corpus-maintenance pass (round 16) — the index
  * maintenance trilogy composed as the ONE job a deployment actually
  * schedules. Three independent decay modes accumulate under streaming
  * ingest, each with its own certified meter-then-heal operator:
  *
  *  - bucket FRAGMENTATION (every streaming append adds a file per
  *    bucket per trigger) — E6 [[graft.sources.Bucketing.compactBucketed]];
  *  - grid DRIFT (appends clamp out-of-range rows into ever-fatter
  *    z-order edge buckets) — E8b [[graft.sources.Layout.maintainZOrdered]];
  *  - quantizer SKEW (appends never re-fit, so a shifting distribution
  *    piles vectors into fat IVF cells until the O(|cell|²) guards
  *    trip) — C7i [[Similarity.rebalanceIvfIndexDir]].
  *
  * Each member meters first and heals only past its budget, so the
  * composed pass inherits the no-op contract: on a healthy corpus it
  * reads three cheap censuses and writes NOTHING — schedule it hourly
  * and it costs what the meters cost. Heals are independent (an index
  * never feeds another member's meter), so one pass is exactly the
  * three passes in sequence; per-artifact failures are NOT caught —
  * a maintenance job that silently skips a sick index is how sick
  * indexes become outages.
  */
object Maintain {

  /** What one pass healed — empty everywhere = the no-op tick. */
  final case class MaintainReport(compacted: Seq[String],
                                  regridded: Seq[String],
                                  rebalanced: Seq[String]) {
    def healedAnything: Boolean =
      compacted.nonEmpty || regridded.nonEmpty || rebalanced.nonEmpty
  }

  /** One meter-then-heal pass over a corpus home.
    *
    * @param bucketedTables catalog names of h-bucketed index tables
    *                       (the D2 ingest streams' postings/fingerprint
    *                       tables) — compacted past
    *                       `targetFilesPerBucket` files per bucket
    * @param layoutDirs     z-ordered layout directories — re-gridded
    *                       past `driftBudgetBp` basis points of clamp
    * @param ivfDirs        IVF index homes (`assigned/` + `centroids/`)
    *                       — rebalanced when any cell exceeds
    *                       `maxCellSize`
    * @return which artifacts healed, by name */
  def maintainCorpus(spark: SparkSession,
                     bucketedTables: Seq[String] = Nil,
                     layoutDirs: Seq[String] = Nil,
                     ivfDirs: Seq[String] = Nil,
                     targetFilesPerBucket: Int = 1,
                     driftBudgetBp: Long = 100L,
                     maxCellSize: Long = 10000L,
                     targetCellSize: Int = 125): MaintainReport =
    MaintainReport(
      bucketedTables.filter(t =>
        graft.sources.Bucketing.compactBucketed(spark, t, targetFilesPerBucket)),
      layoutDirs.filter(d =>
        graft.sources.Layout.maintainZOrdered(spark, d, driftBudgetBp)),
      ivfDirs.filter(d =>
        Similarity.rebalanceIvfIndexDir(spark, d, maxCellSize, targetCellSize)))
}

package graft.operators

import graft.Tables
import graft.functions.vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity: near-dup (C5) and ANN search (C6 brute-force
  * baseline, C7 LSH-bucketed scale path).
  *
  * Scale stance (SURVEY §5): the corpus is never shuffled pairwise —
  * near-dup joins are blocked on a partition key, ANN broadcasts the
  * (small) query set over the corpus scan, and the LSH variant buckets the
  * corpus once into reusable hash buckets.
  */
object Similarity {

  /** C5 `q24_embedding_neardup` — blocked pairwise cosine near-dup: pairs
    * within the same `label` block with cosine ≥ threshold. The block key
    * stands in for the coarse pre-cluster a 100 TB pipeline would compute
    * first (k-means/LSH partition); within-block pairing is the per-bucket
    * verification step. */
  def embeddingNearDup(spark: SparkSession, dir: String, threshold: Double = 0.25,
                       blockCap: Int = 1000): DataFrame =
    embeddingNearDupFrame(
      Tables(spark, dir).embeddings, threshold, blockCap)

  /** DataFrame-level embedding near-dup over any (vec_id, label,
    * embedding) frame.
    *
    * Skew guard (the invariant the whole candidate-generation family
    * keeps): a label block of size B yields O(B²) pairs, and no
    * partition-level mechanism (AQE skew split) can reduce that count —
    * so blocks above `blockCap` NEVER enter the all-pairs join. They are
    * sub-bucketed by sign-random-projection LSH (16 hyperplanes, 4 bands
    * of 4 bits — the `annLsh` machinery) and paired only within
    * (label, band, bucket), then exact-cosine verified. The exact path is
    * unchanged for blocks ≤ cap, so results are identical at any scale
    * where no block exceeds the cap; oversized blocks trade bounded
    * recall loss for a pair count that stays near-linear in B.
    */
  def embeddingNearDupFrame(embeddings: DataFrame, threshold: Double = 0.25,
                            blockCap: Int = 1000,
                            numPlanes: Int = 16, bands: Int = 4,
                            dim: Int = 64): DataFrame = {
    // Norms are computed ONCE per vector before the pairwise join — the
    // join then does a single dot per pair instead of three (3x less
    // floating-point work; the dominant cost at corpus scale).
    // MATERIALIZED: the census, both exact-pair sides, both banded
    // sides, and both payload rejoins all fork from this frame — lazily
    // that was TWELVE scans of the corpus (and twelve norm
    // recomputations); checkpointed it is one scan, and every consumer
    // reads the cached (v, nrm) blocks.
    val e = embeddings
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", vectors.norm(col("v")))
      .localCheckpoint()
    // Label census is a tiny aggregate broadcast back onto the scan: the
    // corpus itself is never shuffled to learn its block sizes.
    val sized = e.join(broadcast(e.groupBy(col("label")).agg(count(lit(1)).as("_bsz"))), Seq("label"))

    def side(df: DataFrame, suffix: String, extra: Seq[String] = Nil) =
      df.select((Seq("label") ++ extra).map(col) ++ Seq(
        col("vec_id").as(s"id_$suffix"), col("v").as(s"v$suffix"), col("nrm").as(s"n$suffix")): _*)

    // exact path: all pairs within blocks of bounded size
    val small = sized.filter(col("_bsz") <= blockCap)
    val exactPairs = side(small, "a").join(side(small, "b"), Seq("label"))
      .filter(col("id_a") < col("id_b"))

    // capped path: oversized blocks pair only within an LSH sub-bucket.
    // `dim` must match the embedding dimension — hyperplanes only span
    // the dimensions they are given, so a too-small dim would LSH-hash
    // on a prefix of the vector and silently lose recall.
    val planes = hyperplanes(numPlanes, dim)
    val rows = numPlanes / bands
    val bigVecs = sized.filter(col("_bsz") > blockCap)
      .select(col("label"), col("vec_id"), col("v"), col("nrm"))
    val banded = bigVecs
      .withColumn("bits", signBits(col("v"), planes))
      .select(col("label"), col("vec_id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            concat_ws("", transform(slice(col("bits"), b * rows + 1, rows), x => x.cast("string"))).as("bh"))
        }: _*)).as("bk"))
      .select(col("label"), col("vec_id"), col("bk.band"), col("bk.bh"))
    // band-collision dedup runs over BARE ID PAIRS — a pair colliding in
    // k bands must not hash two full vectors k times just to dedupe; the
    // payload vectors rejoin once per surviving pair, after the distinct.
    val idPairs = banded.select(col("label"), col("band"), col("bh"), col("vec_id").as("id_a"))
      .join(banded.select(col("label"), col("band"), col("bh"), col("vec_id").as("id_b")),
        Seq("label", "band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("label"), col("id_a"), col("id_b"))
      .distinct()
    val lshPairs = idPairs
      .join(bigVecs.select(col("label"), col("vec_id").as("id_a"),
        col("v").as("va"), col("nrm").as("na")), Seq("label", "id_a"))
      .join(bigVecs.select(col("label"), col("vec_id").as("id_b"),
        col("v").as("vb"), col("nrm").as("nb")), Seq("label", "id_b"))
      .select(col("label"), col("id_a"), col("id_b"),
        col("va"), col("na"), col("vb"), col("nb"))

    exactPairs.select(col("label"), col("id_a"), col("id_b"),
        col("va"), col("na"), col("vb"), col("nb"))
      .unionByName(lshPairs)
      .withColumn("cos", round(
        vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cos") >= threshold)
      .select(col("label"), col("id_a"), col("id_b"), col("cos"))
      .transform(d => Perf.sortedOnce(d, col("id_a"), col("id_b")))
  }

  /** C6 `q25_ann_bruteforce` — exact top-k cosine ANN baseline. The query
    * set (vec_id < 5 here; in production the batch of probe vectors) is
    * broadcast over the corpus scan: cost is one linear pass over the
    * corpus, zero corpus shuffle, top-k via window on the query key.
    * Ranking is on 4-dp-rounded cosine with vec_id tiebreak so results
    * are engine-independent under float summation-order differences. */
  def annBruteForce(spark: SparkSession, dir: String, k: Int = 10, numQueries: Int = 5): DataFrame = {
    val t = Tables(spark, dir)
    val e = t.embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", vectors.norm(col("v")))
    val q = broadcast(
      e.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    e.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      .join(q, col("c_id") =!= col("q_id"))
      .withColumn("cos", round(
        vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .transform(d => Perf.sortedOnce(
        d.select(col("q_id"), col("rank"), col("c_id"), col("cos")),
        col("q_id"), col("rank")))
  }

  /** Deterministic pseudo-random hyperplanes (LCG, fixed seed) — public
    * textbook construction for sign-random-projection LSH. */
  def hyperplanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    var state = 0x5DEECE66DL
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(numPlanes)(Seq.fill(dim)(next()))
  }

  /** Sign-bit signature of `v` against `planes` as an array<int> of 0/1. */
  private def signBits(v: org.apache.spark.sql.Column, planes: Seq[Seq[Double]]) =
    array(planes.map { p =>
      val plane = array(p.map(lit): _*)
      when(vectors.dot(v, plane) > 0, 1).otherwise(0)
    }: _*)

  /** Shared (vec_id, v, nrm) projection both index builders consume —
    * prepare ONCE (and localCheckpoint) when building several index
    * halves over the same corpus, so the cast+norm pass and its blocks
    * aren't duplicated per builder. */
  private[graft] def prepVectors(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", vectors.norm(col("v")))

  /** IVF index build — the build-once half of the inverted-file ANN
    * path: a coarse k-means quantizer (Spark ML distributed KMeans —
    * Lloyd's over the corpus, the standard IVF build step) assigns
    * every corpus vector to a cell.
    *
    * Returns (assigned corpus, centroid table):
    *  - assigned: (vec_id, v, nrm, cell) — persist it bucketed by
    *    `cell` ([[graft.sources.Bucketing.writeBucketed]]) and repeated
    *    query batches skip both the KMeans fit AND the cell-assignment
    *    pass (spec-verified round trip in SimilaritySpec);
    *  - centroids: (cell, cvec, c2) as a real (tiny) table, NOT plan
    *    literals — a production IVF runs 10⁴–10⁵ cells, and literal
    *    centroid arrays would bloat every query plan by tens of MB and
    *    make the per-row probe O(C·dim) inside one expression. As a
    *    table it broadcasts once; `c2 = |c|²` is precomputed so probe
    *    scoring is one dot product per (query, centroid). */
  def buildIvfIndex(embeddings: DataFrame, nClusters: Int = 16,
                    seed: Long = 42L): (DataFrame, DataFrame) =
    buildIvfIndexFrom(prepVectors(embeddings), nClusters, seed)

  /** [[buildIvfIndex]] over an already-prepared (vec_id, v, nrm) frame. */
  private[graft] def buildIvfIndexFrom(e: DataFrame, nClusters: Int,
                                       seed: Long): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = e.sparkSession
    import spark.implicits._
    val fe = e.withColumn("fv", array_to_vector(col("v")))
    val model = new KMeans().setK(nClusters).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(fe)
    val assigned = model.transform(fe)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val centroids = model.clusterCenters.toSeq.zipWithIndex
      .map { case (c, i) =>
        val a = c.toArray
        (i, a.toSeq, a.map(x => x * x).sum)
      }
      .toDF("cell", "cvec", "c2")
    (assigned, centroids)
  }

  /** IVF search over a built (or reloaded) index: each query scores the
    * broadcast centroid table — |c|² − 2·q·c, squared-distance
    * equivalent for fixed q — keeps its `nProbe` nearest cells
    * (row_number over skinny (q_id, d, cell) rows: no wide collect, no
    * giant arrays), and reranks that cell's candidates by exact cosine
    * via the cell equi-join. The corpus is never shuffled; the probe
    * set rejoins its query vectors once (small × small) and broadcasts
    * onto the corpus scan. */
  /** Day-2 IVF maintenance: assign NEW vectors to the EXISTING
    * quantizer's nearest cells and return index-shaped rows to append
    * — no KMeans re-fit, no touch of the existing assigned rows (the
    * ANN analog of `dedupAgainstIndex`: the corpus artifact is extended
    * incrementally, not rebuilt). Cell balance drifts as the
    * distribution shifts; re-run [[buildIvfIndex]] when recall decays
    * — that refit cadence is an operational knob, not a per-batch
    * cost.
    *
    * Assignment is the same broadcast-centroid scoring the probes use
    * (one dot product per vector × cell, top-1 by the shared
    * argmin-distance rule), so an appended vector lands in exactly the
    * cell a search probe would look in. */
  def appendToIvfIndex(newEmbeddings: DataFrame, centroids: DataFrame): DataFrame =
    assignPrepped(prepVectors(newEmbeddings), centroids)

  /** [[appendToIvfIndex]]'s body over an already-prepared (vec_id, v,
    * nrm) frame — shared with the sampled build so corpus assignment
    * never re-preps. */
  private[graft] def assignPrepped(e: DataFrame, centroids: DataFrame): DataFrame = {
    val assigned = probeNearestCells(
      e.select(col("vec_id").as("q_id"), col("v").as("qv")), centroids, nProbe = 1)
    e.join(assigned.withColumnRenamed("q_id", "vec_id"), Seq("vec_id"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
  }

  /** [[buildIvfIndex]] at corpus scale: the KMeans fit runs on a
    * bounded seeded SAMPLE (min(n, fitSampleSize) vectors — Lloyd's
    * iterations cost O(sample · k), independent of corpus size; the
    * standard big-IVF build, e.g. Faiss trains quantizers on a
    * sample), and the FULL corpus then assigns in ONE broadcast pass
    * through the production probe rule ([[assignPrepped]] — the same
    * argmin a day-2 append and a search probe use, so built and
    * appended rows land identically). The full-fit [[buildIvfIndex]]
    * stays the certified small-corpus path (q36's spec surface); this
    * is the 100 TB shape, where fitting Lloyd's on every corpus vector
    * with k ∝ corpus would make the BUILD quadratic. Assignment itself
    * is O(n · k) — the flat-IVF term; past the scale where that bites,
    * the published growth path is k ∝ √n or a two-level quantizer, an
    * operational knob on this same artifact shape. */
  def buildIvfIndexSampled(embeddings: DataFrame, nClusters: Int,
                           seed: Long = 42L,
                           fitSampleSize: Int = 16384): (DataFrame, DataFrame) = {
    require(fitSampleSize >= nClusters,
      s"fitSampleSize ($fitSampleSize) must be >= nClusters ($nClusters) — " +
        "KMeans cannot place more centroids than fit vectors")
    // MATERIALIZED: the count, the sample and the assignment pass all
    // fork this frame
    val e = prepVectors(embeddings).localCheckpoint()
    val n = e.count()
    val fit = if (n <= fitSampleSize) e
      else e.sample(withReplacement = false, fitSampleSize.toDouble / n, seed)
    val (_, centroids) = buildIvfIndexFrom(fit, nClusters, seed)
    val cents = centroids.localCheckpoint()
    (assignPrepped(e, cents), cents)
  }

  /** C7i: day-2 IVF cell REBALANCING — the hot-cell healer (round 15;
    * the index-maintenance sibling of E6's bucket compaction and E8b's
    * grid re-fit): appends never re-fit the quantizer, so a shifting
    * distribution piles mass into a few cells until the O(|cell|²)
    * pair paths blow their loud guards — [[semanticDedup]]'s
    * oversized-cell raise says "retrain the quantizer with more cells",
    * and this is the TARGETED fix: cells past `maxCellSize` are
    * re-quantized LOCALLY (one bounded KMeans over just the fat cell's
    * vectors, k = ⌈size/targetCellSize⌉ sub-cells, sampled fit past
    * `fitSampleSize`), their rows reassign through the production
    * argmin, and the new sub-centroids APPEND to the centroid table
    * under fresh ids. Every other cell, row and centroid is untouched
    * — searches and probes need no migration, the argmin simply has
    * finer candidates where it was drowning.
    *
    * Scale shape: the census is one aggregation; each fat cell costs
    * one bounded fit + one assignment over ITS rows only; the fat-cell
    * list collects to the driver (bounded by the cell count — the
    * zoneMap convention). One pass per invocation, schedulable like
    * [[graft.sources.Bucketing.compactBucketed]]: a healthy index
    * no-ops. Honest limit: a fat cell of near-identical vectors cannot
    * split (sub-centroids collapse, rows re-land together) — that mass
    * is DUPLICATION, and the remedy is the dedup family, not finer
    * quantization.
    *
    * @return (assigned', centroids', rebalanced?) — false = no-op */
  def rebalanceIvfIndex(assigned: DataFrame, centroids: DataFrame,
                        maxCellSize: Long, targetCellSize: Int = 125,
                        seed: Long = 42L, fitSampleSize: Int = 16384)
      : (DataFrame, DataFrame, Boolean) = {
    require(maxCellSize > 0, s"maxCellSize must be positive, got $maxCellSize")
    require(targetCellSize > 0 && targetCellSize <= maxCellSize,
      s"targetCellSize ($targetCellSize) must lie in [1, maxCellSize=$maxCellSize]")
    val spark = assigned.sparkSession
    import spark.implicits._
    // materialized: the census, every fat-cell slice and the keep side
    // all fork this frame
    val a = assigned.select(col("vec_id"), col("v"), col("nrm"),
      col("cell").cast("int").as("cell")).localCheckpoint()
    val fat = a.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxCellSize)
      .as[(Int, Long)].collect().sortBy(_._1)
    if (fat.isEmpty) return (assigned, centroids, false)
    val cents = centroids.select(col("cell").cast("int").as("cell"),
      col("cvec"), col("c2")).localCheckpoint()
    val maxCell = cents.agg(max(col("cell"))).first()
    require(!maxCell.isNullAt(0),
      "rebalanceIvfIndex: centroid table is empty — nothing to rebalance " +
        "against (build the index first)")
    val fatDf = broadcast(fat.map(_._1).toSeq.toDF("cell"))
    val keepA = a.join(fatDf, Seq("cell"), "left_anti")
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val keepC = cents.join(fatDf, Seq("cell"), "left_anti")
    // ONE distributed pass (round 17 — the carried r14 nit retired):
    // each fat cell's SAMPLE (≤ fitSampleSize vectors, a few MB)
    // groups to a single executor task and a local deterministic
    // Lloyd's splits every fat cell inside the SAME job — the driver
    // no longer schedules O(#fat-cells) sequential KMeans fits. The
    // driver-side state is the census it already collected (bounded
    // by #cells) plus the fresh-id block map derived from it.
    val kOf: Map[Int, Int] = fat.map { case (cellId, n) =>
      cellId -> math.max(2, ((n + targetCellSize - 1) / targetCellSize).toInt)
    }.toMap
    val baseOf: Map[Int, Int] = {
      var next = maxCell.getInt(0) + 1
      fat.map { case (cellId, _) =>
        val b = cellId -> next; next += kOf(cellId); b
      }.toMap
    }
    val rateDf = broadcast(fat.map { case (cellId, n) =>
      (cellId, math.min(1.0, fitSampleSize.toDouble / n))
    }.toSeq.toDF("cell", "_rate"))
    val fatRows = a.join(fatDf, Seq("cell"), "left_semi")
      .localCheckpoint() // forked: the sampled fit + the assignment
    // the k/base maps ride the task closure directly (round-18 advice):
    // they are census-bounded (#fat-cells entries), and explicit
    // SparkContext broadcasts created per invocation were never
    // destroyed — repeated maintenance ticks on a long-lived session
    // slowly accumulated driver/executor broadcast state
    val subCents = fatRows.join(rateDf, Seq("cell"))
      .filter(Sharding.md5Unit(col("vec_id"), seed) < col("_rate"))
      .select(col("cell"), col("vec_id"), col("v"))
      .as[(Int, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (cellId, it) =>
        // id-sorted for determinism: same rows ⇒ same init ⇒ same split
        val pts = it.map { case (_, id, v) => (id, v.toArray) }
          .toArray.sortBy(_._1).map(_._2)
        localLloyd(pts, kOf(cellId)).zipWithIndex.map { case (cv, i) =>
          (cellId, baseOf(cellId) + i, cv.toSeq, cv.map(x => x * x).sum)
        }
      }
      .toDF("orig", "cell", "cvec", "c2")
      .localCheckpoint() // forked: the assignment scoring + the union
    require(subCents.select(col("orig")).distinct().count() == fat.size,
      "rebalanceIvfIndex: a fat cell produced no sub-centroids — its " +
        "sample came back empty (raise fitSampleSize)")
    // assignment: each fat row scores ONLY its own cell's sub-centroids
    // — a broadcast join (Σ k rows) + map-side min-struct argmin, the
    // probeNearestCells rule; the corpus side never shuffles
    val best = fatRows.alias("r")
      .join(broadcast(subCents.alias("s")), col("r.cell") === col("s.orig"))
      .select(col("r.vec_id").as("vec_id"),
        col("s.cell").as("_sc"),
        (col("s.c2") - lit(2.0) * vectors.dot(col("r.v"), col("s.cvec")))
          .as("_d"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("_d"), col("_sc"))).as("_m"))
      .select(col("vec_id"), col("_m").getField("_sc").as("cell"))
    val newA = fatRows.select(col("vec_id"), col("v"), col("nrm"))
      .join(best, Seq("vec_id"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    (keepA.unionByName(newA),
      keepC.unionByName(subCents.select(col("cell"), col("cvec"), col("c2"))),
      true)
  }

  /** Deterministic local Lloyd's over ONE fat cell's sample (runs
    * inside a single [[rebalanceIvfIndex]] executor task; the sample
    * is bounded by fitSampleSize, so the working set is a few MB).
    * Init = k evenly-spaced points of the id-sorted sample (a fat
    * cell's substructure is id-blocked in every planted fixture and
    * uniformly interleaved otherwise — either way the spread beats a
    * random draw for determinism at equal quality); 20 fixed
    * iterations; ties break to the lower center; an emptied center
    * keeps its position (the standard guard). */
  private def localLloyd(points: Array[Array[Double]], k: Int,
                         iters: Int = 20): Array[Array[Double]] = {
    val n = points.length
    if (n == 0) return Array.empty
    val kk = math.min(k, n)
    val dim = points(0).length
    var centers = Array.tabulate(kk)(i => points((i.toLong * n / kk).toInt).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val cnts = new Array[Long](kk)
      var pi = 0
      while (pi < n) {
        val p = points(pi)
        var bestC = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          val cv = centers(c)
          var d = 0.0
          var j = 0
          while (j < dim) { val t = p(j) - cv(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; bestC = c }
          c += 1
        }
        val s = sums(bestC)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        cnts(bestC) += 1
        pi += 1
      }
      centers = Array.tabulate(kk)(c =>
        if (cnts(c) == 0) centers(c) else sums(c).map(_ / cnts(c)))
      it += 1
    }
    centers
  }

  /** C7i at the PERSISTED index (round 16 — the form the schedulable
    * composed maintenance pass consumes): an IVF index home directory
    * holding `assigned/` and `centroids/` parquet tables rebalances
    * in place under the E3/E6/E8b staged-then-rename protocol — both
    * tables stage COMPLETELY under `dir__rebal`, the live home renames
    * aside, the staging renames in, the old drops — so the
    * assigned/centroid PAIR swaps together (swapping them separately
    * would open a window where probes read an assignment against a
    * centroid table that no longer carries its cells). The one crash
    * window (home absent, `dir__old` present) self-heals on entry,
    * the Layout.regrid reclaim rule.
    * @return true when a rebalance rewrite happened */
  def rebalanceIvfIndexDir(spark: SparkSession, dir: String,
                           maxCellSize: Long, targetCellSize: Int = 125,
                           seed: Long = 42L): Boolean = {
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(dir + "__old")
    if (!fs.exists(live) && fs.exists(old))
      require(fs.rename(old, live),
        s"rebalance reclaim: could not rename $old back to $dir")
    val (a2, c2, did) = rebalanceIvfIndex(
      spark.read.parquet(s"$dir/assigned"),
      spark.read.parquet(s"$dir/centroids"),
      maxCellSize, targetCellSize, seed)
    if (!did) return false
    val tmp = new org.apache.hadoop.fs.Path(dir + "__rebal")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(old)) fs.delete(old, true)
    // localCheckpoint upstream (rebalanceIvfIndex materializes its
    // inputs), so the staging write never reads the files the renames
    // retire
    a2.write.parquet(s"$tmp/assigned")
    c2.write.parquet(s"$tmp/centroids")
    require(fs.rename(live, old), s"rebalance: could not rename $dir aside")
    require(fs.rename(tmp, live), s"rebalance: could not install the new index")
    fs.delete(old, true)
    true
  }

  /** A trained coarse-quantizer artifact with its STRUCTURE abstracted
    * (round 14 — the auto rule generalized off the text path): one
    * `assigned` (vec_id, v, nrm, cell) corpus frame plus the
    * structure's own day-2 rules, so every vector pipeline (ANN
    * corpus, SemDeDup, streaming ingest) can consume "a trained index"
    * without hard-coding flat vs two-level — the choice that
    * SCALING_r13 measured turning quadratic when hard-coded wrong. */
  sealed trait VectorIndex {
    /** (vec_id, v, nrm, cell) — persist bucketed by cell. */
    def assigned: DataFrame
    /** Day-2 append: new vectors through the structure's SHARED build
      * rule — appended rows land exactly where the build puts them. */
    def assign(newEmbeddings: DataFrame): DataFrame
    /** Day-2 semantic-dedup probe against a persisted corpus frame of
      * this structure (probe-side recall widening where the structure
      * supports it — the two-level case probes nProbe=2 per half). */
    def dedupProbe(newEmbeddings: DataFrame, corpus: DataFrame,
                   threshold: Double = 0.25, maxCellSize: Int = 10000): DataFrame
  }

  /** Flat IVF: one centroid table, O(n·cells) assignment — the right
    * constant below [[FlatCellsCrossover]] cells. */
  final case class FlatVectorIndex(assigned: DataFrame, centroids: DataFrame)
      extends VectorIndex {
    def assign(newEmbeddings: DataFrame): DataFrame =
      appendToIvfIndex(newEmbeddings, centroids)
    def dedupProbe(newEmbeddings: DataFrame, corpus: DataFrame,
                   threshold: Double, maxCellSize: Int): DataFrame =
      semanticDedupAgainstIndex(newEmbeddings, corpus, centroids,
        threshold, maxCellSize)
  }

  /** Two-level (IMI): per-half sub-quantizers, product cells,
    * O(n·√cells) assignment — the growth structure past the
    * crossover. */
  final case class TwoLevelVectorIndex(assigned: DataFrame, cent1: DataFrame,
                                       cent2: DataFrame, k2: Int)
      extends VectorIndex {
    def assign(newEmbeddings: DataFrame): DataFrame =
      appendToIvfIndexTwoLevel(newEmbeddings, cent1, cent2, k2)
    def dedupProbe(newEmbeddings: DataFrame, corpus: DataFrame,
                   threshold: Double, maxCellSize: Int): DataFrame =
      semanticDedupAgainstImiIndex(newEmbeddings, corpus, cent1, cent2, k2,
        threshold, maxCellSize)
  }

  /** The measured flat→two-level crossover in CELLS (SCALING_r13: tie
    * at 40 cells, IMI wins 1.7× at 400, flat quadratics at 1200) —
    * [[graft.operators.TextEmbed.FlatCellsCrossover]] re-exposes it
    * where the text pipeline documents the measurement. */
  val FlatCellsCrossover = 128L

  /** The structure decision, PURE (spec-pinned without a build):
    * "auto" = flat through [[FlatCellsCrossover]] cells, two-level
    * past it; "flat"/"imi" force. */
  private[graft] def useTwoLevel(cells: Long, quantizer: String): Boolean =
    quantizer match {
      case "flat" => false
      case "imi"  => true
      case "auto" => cells > FlatCellsCrossover
      case other => throw new IllegalArgumentException(
        s"quantizer must be one of auto|flat|imi, got '$other'")
    }

  /** Build a trained coarse quantizer with the STRUCTURE picked from
    * the same corpus-derived cell count that sizes it (the round-14
    * production rule, generalized from q134's text path): cells =
    * corpus / targetCellSize (capped so Lloyd's always sees ≥ 2
    * vectors per centroid), flat below the measured crossover,
    * two-level above — so no embedding pipeline hard-codes the
    * structure that goes quadratic when the corpus outgrows it. Both
    * branches fit on the same bounded seeded sample. */
  def buildVectorIndexAuto(embeddings: DataFrame, targetCellSize: Int = 125,
                           seed: Long = 42L, fitSampleSize: Int = 16384,
                           quantizer: String = "auto"): VectorIndex = {
    require(targetCellSize > 0, s"targetCellSize must be positive, got $targetCellSize")
    val e = prepVectors(embeddings).localCheckpoint()
    val n = e.count()
    val cells = math.max(4L,
      math.min((n + targetCellSize - 1) / targetCellSize, fitSampleSize / 2L))
    if (useTwoLevel(cells, quantizer)) {
      val k = math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt)
      val (assigned, c1, c2) = buildTwoLevelFrom(e, n, k, k, seed, fitSampleSize)
      TwoLevelVectorIndex(assigned, c1, c2, k)
    } else {
      val fit = if (n <= fitSampleSize) e
        else e.sample(withReplacement = false, fitSampleSize.toDouble / n, seed)
      val (_, centroids) = buildIvfIndexFrom(fit, cells.toInt, seed)
      val cents = centroids.localCheckpoint()
      FlatVectorIndex(assignPrepped(e, cents), cents)
    }
  }

  /** TWO-LEVEL (inverted multi-index) quantizer — the flat-IVF growth
    * path [[buildIvfIndexSampled]] documents, BUILT (Babenko &
    * Lempitsky 2012, "The Inverted Multi-Index" — public): two
    * INDEPENDENT coarse quantizers over the two vector halves; a
    * vector's cell is the PRODUCT cell `c1 · k2 + c2`, giving k1 · k2
    * effective cells while assignment scores only k1 + k2 ≈ 2·√cells
    * centroids per vector. With cells ∝ corpus (the bounded-cell
    * SemDeDup rule), flat assignment is O(n · cells) — the eventual
    * 100 TB limiter — while this is O(n · √cells).
    *
    * Both sub-quantizers train on the SAME bounded seeded sample
    * (Lloyd's cost corpus-independent); halves assign by the shared
    * argmin probe rule, so [[assignTwoLevel]] reproduces build
    * assignments for day-2 appends exactly. Product cells are plain
    * ints — everything downstream ([[semanticDedupAssigned]],
    * bucketed persistence, the census guard) consumes them unchanged.
    * Cell-size balance is DATA-dependent (a product cell can be empty
    * or hot); `maxCellSize` in the consumers stays the loud guard.
    *
    * @return (assigned (vec_id, v, nrm, cell), sub-centroid tables
    *         (cell, cvec, c2) for each half — persist both next to
    *         the index) */
  def buildIvfIndexTwoLevel(embeddings: DataFrame, k1: Int, k2: Int,
                            seed: Long = 42L,
                            fitSampleSize: Int = 16384)
      : (DataFrame, DataFrame, DataFrame) = {
    val e = prepVectors(embeddings).localCheckpoint()
    buildTwoLevelFrom(e, e.count(), k1, k2, seed, fitSampleSize)
  }

  /** [[buildIvfIndexTwoLevel]] over an already-prepped, MATERIALIZED
    * frame with a known count (shared with the q138 text path so the
    * corpus preps and counts once). */
  private[graft] def buildTwoLevelFrom(e: DataFrame, n: Long, k1: Int, k2: Int,
                                       seed: Long, fitSampleSize: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(k1 >= 2 && k2 >= 2, s"need k1, k2 >= 2, got ($k1, $k2)")
    require(fitSampleSize >= 2 * math.max(k1, k2),
      s"fitSampleSize ($fitSampleSize) must be >= 2 * max(k1, k2)")
    val fit = if (n <= fitSampleSize) e
      else e.sample(withReplacement = false, fitSampleSize.toDouble / n, seed)
    val dim = e.select(size(col("v"))).head().getInt(0)
    require(dim >= 4, s"two-level quantization needs dim >= 4, got $dim")
    val h = dim / 2
    def half(df: DataFrame, first: Boolean) = {
      val hv = if (first) slice(col("v"), 1, h) else slice(col("v"), h + 1, dim - h)
      df.select(col("vec_id"), hv.as("v"), vectors.norm(hv).as("nrm"))
    }
    val (_, cent1) = buildIvfIndexFrom(half(fit, first = true), k1, seed)
    val (_, cent2) = buildIvfIndexFrom(half(fit, first = false), k2, seed + 1)
    val (c1, c2) = (cent1.localCheckpoint(), cent2.localCheckpoint())
    (assignTwoLevel(e, c1, c2, k2), c1, c2)
  }

  /** The two-level assignment rule — shared by the build and day-2
    * appends (the [[appendToIvfIndex]] convention): each half probes
    * its own sub-quantizer (argmin |c|²−2·v·c, tie → lower cell) and
    * the product cell is `c1 · k2 + c2`. `k2` must be the second
    * table's cell count (checked loudly). */
  def assignTwoLevel(prepped: DataFrame, cent1: DataFrame, cent2: DataFrame,
                     k2: Int): DataFrame = {
    val e = prepped.select(col("vec_id"), col("v"), col("nrm"))
    val dim2 = cent2.select(size(col("cvec"))).head().getInt(0)
    val dim1 = cent1.select(size(col("cvec"))).head().getInt(0)
    val nC2 = cent2.count()
    require(nC2 == k2,
      s"k2 ($k2) must equal the second sub-quantizer's cell count ($nC2) — " +
        "a mismatched stride would alias product cells")
    def probe(hv: Column, cents: DataFrame, name: String) =
      probeNearestCells(
        e.select(col("vec_id").as("q_id"), hv.as("qv")), cents, nProbe = 1)
        .withColumnRenamed("cell", name)
        .withColumnRenamed("q_id", "vec_id")
    val a1 = probe(slice(col("v"), 1, dim1), cent1, "_c1")
    val a2 = probe(slice(col("v"), dim1 + 1, dim2), cent2, "_c2")
    e.join(a1, Seq("vec_id")).join(a2, Seq("vec_id"))
      .select(col("vec_id"), col("v"), col("nrm"),
        (col("_c1") * k2 + col("_c2")).as("cell"))
  }

  /** Day-2 append for the two-level index: prep + the shared
    * [[assignTwoLevel]] rule — appended vectors land in exactly the
    * product cell the build would give them. */
  def appendToIvfIndexTwoLevel(newEmbeddings: DataFrame, cent1: DataFrame,
                               cent2: DataFrame, k2: Int): DataFrame =
    assignTwoLevel(prepVectors(newEmbeddings), cent1, cent2, k2)

  /** ANN search over the TWO-LEVEL index — IMI probing (Babenko &
    * Lempitsky 2012): each query keeps its `nProbe` nearest cells PER
    * HALF and probes their nProbe² PRODUCT cells. Squared distance
    * decomposes over the halves (|v−c|² = |v₁−c₁|² + |v₂−c₂|²), so the
    * probed set provably contains the nProbe²-best product centroids —
    * the property that makes per-half probing sound. Candidates rerank
    * by exact cosine via the cell equi-join, the [[annIvfSearch]]
    * shape: the corpus never shuffles, the probe set broadcasts. */
  def annImiSearch(assigned: DataFrame, cent1: DataFrame, cent2: DataFrame,
                   k2: Int, k: Int = 10, numQueries: Int = 5,
                   nProbe: Int = 2): DataFrame = {
    require(nProbe >= 1, s"nProbe must be positive, got $nProbe")
    val dim1 = cent1.select(size(col("cvec"))).head().getInt(0)
    val dim2 = cent2.select(size(col("cvec"))).head().getInt(0)
    val queries = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    def halfProbe(hv: Column, cents: DataFrame, name: String) =
      probeNearestCells(
        queries.select(col("q_id"), hv.as("qv")), cents, nProbe)
        .withColumnRenamed("cell", name)
    val probes = halfProbe(slice(col("qv"), 1, dim1), cent1, "_c1")
      .join(halfProbe(slice(col("qv"), dim1 + 1, dim2), cent2, "_c2"), Seq("q_id"))
      .select(col("q_id"), (col("_c1") * k2 + col("_c2")).as("cell"))
      .join(queries, Seq("q_id"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    assigned.select(col("cell"), col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("cos", round(
        vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .transform(d => Perf.sortedOnce(
        d.select(col("q_id"), col("rank"), col("c_id"), col("cos")),
        col("q_id"), col("rank")))
  }

  def annIvfSearch(assigned: DataFrame, centroids: DataFrame,
                   k: Int = 10, numQueries: Int = 5, nProbe: Int = 4): DataFrame = {
    val queries = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val probes = probeNearestCells(queries, centroids, nProbe).join(queries, Seq("q_id"))

    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    assigned.select(col("cell"), col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("cos", round(
        vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .transform(d => Perf.sortedOnce(
        d.select(col("q_id"), col("rank"), col("c_id"), col("cos")),
        col("q_id"), col("rank")))
  }

  /** `q36_ann_ivf` — IVF (inverted-file) ANN, the other scale path the
    * survey names alongside LSH: [[buildIvfIndex]] + [[annIvfSearch]]
    * in one shot. Recall + cosine parity vs the brute-force baseline
    * and the persisted-index round trip are spec-tested. */
  def annIvf(spark: SparkSession, dir: String, k: Int = 10, numQueries: Int = 5,
             nClusters: Int = 16, nProbe: Int = 4): DataFrame = {
    val (assigned, centroids) = buildIvfIndex(Tables(spark, dir).embeddings, nClusters)
    annIvfSearch(assigned, centroids, k, numQueries, nProbe)
  }

  /** C7b `q79_ann_ivf_portable` — the IVF SEARCH semantics on
    * formula-chosen centroids: the first 16 corpus vectors anchor the
    * cells (each centroid-vector provably lands in its own cell — the
    * self-distance −|v|² is the Cauchy-Schwarz minimum), every corpus
    * vector is assigned through the PRODUCTION day-2 rule
    * ([[appendToIvfIndex]]: argmin of |c|² − 2·v·c, tie → lower cell)
    * and queries run the production [[annIvfSearch]] (nProbe nearest
    * cells, exact-cosine rerank, cos-desc/id-asc tie-break). KMeans
    * training is the ONLY piece of q36 an oracle can't reproduce, so
    * this twin pins everything else: assignment, probing, candidate
    * generation and rerank all hash-check against a from-scratch
    * DuckDB reformulation (the q74/q77/q78 portable-twin pattern). */
  def annIvfPortable(spark: SparkSession, dir: String, k: Int = 10,
                     numQueries: Int = 5, nProbe: Int = 4): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val centroids = prepVectors(emb).filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("cvec"),
        vectors.dot(col("v"), col("v")).as("c2"))
    val assigned = appendToIvfIndex(emb, centroids)
    annIvfSearch(assigned, centroids, k, numQueries, nProbe)
  }

  /** C7f: recall@k EVALUATION of an approximate search result against
    * exact ground truth — the index-quality meter read before choosing
    * nProbe/cells: an approximate tier is only shippable with a
    * MEASURED recall, and the measurement is itself one distributed
    * query (truth ⋈ approx on (q_id, c_id), one count per query
    * point). Every search in this family breaks ties identically
    * (cos DESC, id ASC), so top-k SETS are well-defined and recall is
    * exact integer basis points — no float boundary in the metric.
    * Queries the approx tier missed entirely still report (recall 0):
    * an evaluation that silently drops its worst rows isn't one. */
  def annRecall(truth: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val hits = truth.select(col("q_id"), col("c_id"))
      .join(approx.select(col("q_id"), col("c_id")), Seq("q_id", "c_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("_h"))
    truth.select(col("q_id")).distinct()
      .join(hits, Seq("q_id"), "left")
      .withColumn("n_hits", coalesce(col("_h"), lit(0L)))
      .select(col("q_id"), lit(k.toLong).as("k"), col("n_hits"),
        expr(s"CAST((n_hits * 10000) DIV $k AS BIGINT)").as("recall_bp"))
  }

  /** C7f `q161_ann_recall` — [[annRecall]] of the q79 portable IVF
    * tier at nProbe 1 and 4 against the q25 exact brute force, on the
    * same formula-chosen centroids: the measured effect of the probe
    * knob, per query point, oracle-replayed end to end (brute chain +
    * the q79 chain at both widths + the intersection counts). */
  def annRecallReport(spark: SparkSession, dir: String, k: Int = 10,
                      numQueries: Int = 5): DataFrame = {
    val truth = annBruteForce(spark, dir, k, numQueries).localCheckpoint()
    // ONE formula build shared by both tiers (r19): the q79 centroid
    // table and the production day-2 assignment are nProbe-independent
    // — re-running annIvfPortable per tier paid the corpus assignment
    // twice for an identical frame (only the probe width differs)
    val emb = Tables(spark, dir).embeddings
    val centroids = prepVectors(emb).filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("cvec"),
        vectors.dot(col("v"), col("v")).as("c2"))
      .localCheckpoint()
    val assigned = appendToIvfIndex(emb, centroids).localCheckpoint()
    def tier(nProbe: Int): DataFrame =
      annRecall(truth, annIvfSearch(assigned, centroids, k, numQueries, nProbe), k)
        .withColumn("tier", lit(s"ivf_np$nProbe"))
    Perf.sortedOnce(
      tier(1).unionByName(tier(4))
        .select(col("tier"), col("q_id"), col("k"), col("n_hits"), col("recall_bp")),
      col("tier"), col("q_id"))
  }

  /** C7f `q162_ann_pq_recall` — [[annRecall]] of the q80 portable PQ
    * tier at ADC rerank cuts 10 and 50 against exact brute force: the
    * OTHER recall knob the family exposes (how many ADC-ranked
    * candidates reach the exact-cosine rerank), measured the same way
    * the IVF probe knob is (q161). Monotone for the same reason —
    * the rerank is exact, so a wider cut's candidate superset
    * dominates. */
  def annPqRecallReport(spark: SparkSession, dir: String, k: Int = 10,
                        numQueries: Int = 5): DataFrame = {
    val truth = annBruteForce(spark, dir, k, numQueries).localCheckpoint()
    // ONE formula codebook + corpus encode shared by both tiers (r19):
    // the rerank cut is applied at SEARCH time, so re-running
    // annPqPortable per tier re-encoded the identical corpus twice
    val emb = Tables(spark, dir).embeddings
    val codebook = formulaPqCodebook(prepVectors(emb), 8, 16, 8)
      .localCheckpoint()
    val encoded = appendToPqIndex(emb, codebook, 8, 16, 64).localCheckpoint()
    def tier(rerank: Int): DataFrame =
      annRecall(truth,
        annPqSearch(encoded, codebook, k, numQueries, rerank, 8, 16, 64), k)
        .withColumn("tier", lit(f"pq_r$rerank%02d"))
    Perf.sortedOnce(
      tier(10).unionByName(tier(50))
        .select(col("tier"), col("q_id"), col("k"), col("n_hits"), col("recall_bp")),
      col("tier"), col("q_id"))
  }

  /** C7f: the q139 formula-twin IMI SEARCH chain — sub-quantizer cell j
    * of each half is corpus vector j's own half (j < k1/k2), the whole
    * corpus assigns through the PRODUCTION two-level rule
    * ([[assignTwoLevel]]) and queries run the production
    * [[annImiSearch]] — so the two-level tier's recall is
    * oracle-measurable end to end (q163), the way q79 made the flat
    * IVF tier measurable (q161). Production feeds
    * [[buildIvfIndexTwoLevel]] artifacts instead; the two differ ONLY
    * in where the sub-centroid tables came from. */
  def annImiPortable(spark: SparkSession, dir: String, k: Int = 10,
                     numQueries: Int = 5, nProbe: Int = 2,
                     k1: Int = 4, k2: Int = 4, dim: Int = 64): DataFrame = {
    val e = prepVectors(Tables(spark, dir).embeddings).localCheckpoint()
    val h = dim / 2
    def halfCent(first: Boolean, kk: Int) = {
      val hv = if (first) slice(col("v"), 1, h) else slice(col("v"), h + 1, dim - h)
      e.filter(col("vec_id") < kk)
        .select(col("vec_id").cast("int").as("cell"), hv.as("cvec"),
          vectors.dot(hv, hv).as("c2"))
    }
    val cent1 = halfCent(first = true, k1)
    val cent2 = halfCent(first = false, k2)
    annImiSearch(assignTwoLevel(e, cent1, cent2, k2), cent1, cent2, k2,
      k, numQueries, nProbe)
  }

  /** C7f `q163_ann_imi_recall` — [[annRecall]] of the TWO-LEVEL (IMI)
    * tier at per-half probe widths 1 and 2 against exact brute force:
    * the tier a 100 TB deployment actually ships (q139's index shape)
    * gets the same measured operating points the flat IVF tier got in
    * q161. nProbe=1 probes ONE product cell per query; nProbe=2 probes
    * the 4 best per-half combinations — monotone by the same
    * exact-rerank superset dominance. */
  def annImiRecallReport(spark: SparkSession, dir: String, k: Int = 10,
                         numQueries: Int = 5): DataFrame = {
    val truth = annBruteForce(spark, dir, k, numQueries).localCheckpoint()
    // ONE two-level assignment shared by both tiers (r19): nProbe is a
    // pure search-time knob — re-running annImiPortable per tier paid
    // the per-half argmin corpus assignment twice (q163's measured
    // cost is the assignment, not the query-batch probe)
    val e = prepVectors(Tables(spark, dir).embeddings).localCheckpoint()
    val h = 32
    def halfCent(first: Boolean, kk: Int) = {
      val hv = if (first) slice(col("v"), 1, h) else slice(col("v"), h + 1, h)
      e.filter(col("vec_id") < kk)
        .select(col("vec_id").cast("int").as("cell"), hv.as("cvec"),
          vectors.dot(hv, hv).as("c2"))
    }
    val cent1 = halfCent(first = true, 4).localCheckpoint()
    val cent2 = halfCent(first = false, 4).localCheckpoint()
    val assigned = assignTwoLevel(e, cent1, cent2, 4).localCheckpoint()
    def tier(nProbe: Int): DataFrame =
      annRecall(truth,
        annImiSearch(assigned, cent1, cent2, 4, k, numQueries, nProbe), k)
        .withColumn("tier", lit(s"imi_np$nProbe"))
    Perf.sortedOnce(
      tier(1).unionByName(tier(2))
        .select(col("tier"), col("q_id"), col("k"), col("n_hits"), col("recall_bp")),
      col("tier"), col("q_id"))
  }

  /** C7f `q164_ann_imipq_recall` — [[annRecall]] of the COMPOSED
    * IMI+ADC tier (q141's formula chain: two-level coarse cells +
    * residual PQ codes) at ADC rerank cuts 10 and 50 against exact
    * brute force. This is the headline 100 TB configuration — codes,
    * not vectors, scanned in the probed product cells — so its recall
    * knob is the one that matters most to meter. */
  def annImiPqRecallReport(spark: SparkSession, dir: String, k: Int = 10,
                           numQueries: Int = 5): DataFrame = {
    val truth = annBruteForce(spark, dir, k, numQueries).localCheckpoint()
    // ONE formula build + corpus encode shared by both tiers (r19):
    // only the search-time rerank cut differs between them
    val search = annImiPqPortableBuild(spark, dir, k, numQueries, nProbe = 2)
    def tier(rerank: Int): DataFrame =
      annRecall(truth, search(rerank), k)
        .withColumn("tier", lit(f"imipq_r$rerank%02d"))
    Perf.sortedOnce(
      tier(10).unionByName(tier(50))
        .select(col("tier"), col("q_id"), col("k"), col("n_hits"), col("recall_bp")),
      col("tier"), col("q_id"))
  }

  /** C6b: deterministic Johnson–Lindenstrauss SIGN random projection —
    * dimensionality reduction for the embedding family (Achlioptas
    * 2003, "Database-friendly random projections": ±1 entries are a
    * valid JL family): p[j] = (v · plane_j) / √outDim over the
    * [[md5SignPlanes]] formula planes, so ANY engine regenerates the
    * identical projection and the operator is oracle-backable end to
    * end (q169). At 100 TB this is the scan-width lever BEFORE any ANN
    * tier: a 64→16 projection cuts the candidate-scoring scan's bytes
    * 4× while JL keeps pairwise geometry within the usual ±O(1/√outDim)
    * distortion — and it is one map-only projection, no shuffle, no
    * training, retry-deterministic.
    *
    * `outDim` must be a power of FOUR so the 1/√outDim scale is a
    * negative power of two — float-EXACT, keeping engine parity free of
    * a rounding boundary. */
  def projectVectors(embeddings: DataFrame, outDim: Int = 16,
                     dim: Int = 64): DataFrame = {
    require(outDim >= 4 && Integer.bitCount(outDim) == 1 &&
      Integer.numberOfTrailingZeros(outDim) % 2 == 0,
      s"outDim must be a power of four (4, 16, 64, …) so 1/√outDim is " +
        s"float-exact, got $outDim")
    val planes = md5SignPlanes(outDim, dim)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    prepVectors(embeddings).select(col("vec_id"), col("v"), col("nrm"),
      array(planes.map { p =>
        vectors.dot(col("v"), array(p.map(lit): _*)) * lit(scale)
      }: _*).as("pvec"))
  }

  /** C6b `q169_jl_projection` — [[projectVectors]] exploded to
    * (vec_id, j, p) scalar rows, every component hash-checked against
    * the DuckDB re-derivation (planes from the shared md5 formula,
    * index-order dot fold, the exact 0.25 scale, 4-dp rounding). */
  def jlProjectionDocs(spark: SparkSession, dir: String): DataFrame =
    projectVectors(Tables(spark, dir).embeddings)
      .select(col("vec_id"), posexplode(col("pvec")))
      .select(col("vec_id"), col("pos").cast("long").as("j"),
        round(col("col"), 4).as("p"))
      .orderBy(col("vec_id"), col("j"))

  /** C6b: ANN THROUGH the projection — candidates scored in the
    * outDim-wide projected space (the 4×-narrower scan), top `rerank`
    * per query exact-reranked in the original space. The same
    * score-cheap-then-rerank-exact shape as the PQ tier, with a
    * training-free, one-pass "encode". */
  def annJlSearch(spark: SparkSession, dir: String, k: Int = 10,
                  numQueries: Int = 5, rerank: Int = 50,
                  outDim: Int = 16): DataFrame = {
    val p = projectVectors(Tables(spark, dir).embeddings, outDim)
      .localCheckpoint()
    val qs = broadcast(p.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("pvec").as("qp")))
    val wP = Window.partitionBy(col("q_id"))
      .orderBy(col("pdot").desc, col("c_id").asc)
    val cands = p.select(col("vec_id").as("c_id"), col("pvec").as("cp"))
      .join(qs, col("c_id") =!= col("q_id"))
      .withColumn("pdot", vectors.dot(col("qp"), col("cp")))
      .withColumn("pr", row_number().over(wP))
      .filter(col("pr") <= rerank)
      .select(col("q_id"), col("c_id"))
    val full = p.select(col("vec_id"), col("v"), col("nrm"))
    exactRerankById(cands, full, full.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn")), k)
  }

  /** C7f `q168_ann_lsh_recall` — [[annRecall]] of the LSH tier (q78's
    * md5-sign plane chain) at band splits 2 vs 4 over the 16 signature
    * bits: the LSH recall knob. Band boundaries nest (bands of 8 bits
    * are pairs of adjacent 4-bit bands), so a 2-band collision implies
    * both constituent 4-band collisions — candidate superset, monotone
    * under the exact rerank, same dominance argument as the probe
    * knobs. With this row every ANN tier in the family is metered. */
  def annLshRecallReport(spark: SparkSession, dir: String, k: Int = 10,
                         numQueries: Int = 5): DataFrame = {
    val truth = annBruteForce(spark, dir, k, numQueries).localCheckpoint()
    def tier(bands: Int): DataFrame =
      annRecall(truth, annLshPortable(spark, dir, k, numQueries, bands = bands), k)
        .withColumn("tier", lit(s"lsh_b$bands"))
    Perf.sortedOnce(
      tier(2).unionByName(tier(4))
        .select(col("tier"), col("q_id"), col("k"), col("n_hits"), col("recall_bp")),
      col("tier"), col("q_id"))
  }

  /** C7f `q167_ann_pq_codebook` — [[annRecall]] of the PQ tier at
    * codebook sizes 16 and 64 (fixed ADC cut 50) against exact brute
    * force: the OTHER PQ knob. q162 showed the ADC cut buys recall
    * linearly in rerank cost; this row shows what a BIGGER CODEBOOK
    * buys at constant search cost — the operating-point choice a
    * deployment actually makes (codebook size prices the one-time
    * encode + table memory, not the per-query scan). */
  def annPqCodebookRecallReport(spark: SparkSession, dir: String, k: Int = 10,
                                numQueries: Int = 5): DataFrame = {
    val truth = annBruteForce(spark, dir, k, numQueries).localCheckpoint()
    def tier(cb: Int): DataFrame =
      annRecall(truth,
        annPqPortable(spark, dir, k, numQueries, rerank = 50, codebookSize = cb), k)
        .withColumn("tier", lit(f"pq_cb$cb%02d"))
    Perf.sortedOnce(
      tier(16).unionByName(tier(64))
        .select(col("tier"), col("q_id"), col("k"), col("n_hits"), col("recall_bp")),
      col("tier"), col("q_id"))
  }

  /** PQ (product quantization) index build — the memory-side scale path
    * of the ANN family: split each vector into `subspaces` sub-vectors,
    * k-means each subspace into a `codebookSize`-entry codebook (one
    * distributed Lloyd's run per subspace — m is small, each run
    * distributed), and ENCODE every corpus vector as m small codes. At
    * 100 TB the working set for candidate scoring drops from dim
    * doubles to m bytes per vector (64-dim float64 → 8 codes is a 64×
    * reduction) — the scan that ranks candidates reads ONLY the code
    * column.
    *
    * Returns (encoded corpus, codebook table):
    *  - encoded: (vec_id, v, nrm, codes array<int>) — persistable like
    *    the IVF index; the ADC scan projects (vec_id, codes) only;
    *  - codebook: (subspace, code, centroid) — a tiny REAL table (the
    *    IVF plan-literal lesson), broadcast at query time. */
  def buildPqIndex(embeddings: DataFrame, subspaces: Int = 8, codebookSize: Int = 16,
                   dim: Int = 64, seed: Long = 42L): (DataFrame, DataFrame) = {
    // materialized once: all m codebook fits and the encoding pass read
    // these blocks instead of re-scanning the source per subspace
    val e = prepVectors(embeddings).localCheckpoint()
    val (encoded, codebook) = buildPqIndexFrom(e, subspaces, codebookSize, dim, seed)
    // the encoded frame is read several times per search (ADC scan,
    // rerank refetch, query projection) — materialize it ONCE and free
    // the superseded preparation blocks (the codebook is driver-built;
    // nothing else reads them), so repeated builds don't pin stale
    // corpus copies in executor storage
    val encodedCk = encoded.localCheckpoint()
    Dedup.freeBlocks(e)
    (encodedCk, codebook)
  }

  /** [[buildPqIndex]] over an already-prepared — and, for the m
    * concurrent fits, already-MATERIALIZED (or derived map-only from a
    * materialized frame) — input. `vecCol` selects WHAT gets quantized:
    * "v" for raw vectors, a residual column for IVFADC; every input
    * column is carried through to the encoded output. */
  private[graft] def buildPqIndexFrom(e: DataFrame, subspaces: Int, codebookSize: Int,
                                      dim: Int, seed: Long,
                                      vecCol: String = "v"): (DataFrame, DataFrame) = {
    require(dim % subspaces == 0, s"dim $dim must divide into $subspaces subspaces")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = e.sparkSession
    import spark.implicits._
    val dsub = dim / subspaces
    // declarative length guard (the dedupAgainstIndex convention): a
    // corpus whose vectors are longer than `dim` would otherwise be
    // SILENTLY truncated to the first `dim` components (slice never
    // complains), quantizing half of every vector away and degrading
    // ADC recall with no error — and checkPqParams can't catch it later
    // because build and probe would agree on the same wrong dim
    val checked = e.withColumn(vecCol,
      when(size(col(vecCol)) =!= dim,
        raise_error(concat(lit("buildPqIndexFrom: vector length "),
          size(col(vecCol)).cast("string"),
          lit(s" != dim=$dim in column '$vecCol' — pass the actual embedding dim"))))
        .otherwise(col(vecCol)))
    // the m fits are INDEPENDENT — run them as concurrent Spark jobs
    // (each internally distributed; the scheduler interleaves stages),
    // so build wall-clock is ~one fit, not m sequential fits. k-means||
    // init (the IVF build's default) + bounded Lloyd's iterations:
    // random init collapses duplicate seeds on tightly-clustered
    // subspace distributions (two seeds in one tight cluster → an empty
    // cluster dies → fewer than codebookSize centers → the loud guard
    // below fires), while k-means|| oversamples and keeps k spread
    // centers. Deterministic per (seed + subspace).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val models = Await.result(
      Future.sequence((0 until subspaces).map { s =>
        Future {
          // blocking{}: each fit holds a pool thread for a full Spark
          // action, so tell the fork-join pool to spawn replacements —
          // otherwise a host with fewer cores than subspaces silently
          // degrades the build toward sequential
          scala.concurrent.blocking {
            val sub = checked.select(array_to_vector(slice(col(vecCol), s * dsub + 1, dsub)).as("fv"))
            new KMeans().setK(codebookSize).setSeed(seed + s)
              .setMaxIter(10)
              .setFeaturesCol("fv").setPredictionCol("code").fit(sub)
          }
        }
      }.toSeq),
      scala.concurrent.duration.Duration.Inf)
    // a model with FEWER than codebookSize centers (corpus smaller than
    // k) would leave holes in the flat ADC table and shift every later
    // subspace's positions — out-of-bounds lookups then return null,
    // which sorts NULLS FIRST in the ascending ADC window and silently
    // promotes garbage candidates. Fail the build loudly instead.
    models.zipWithIndex.foreach { case (m, s) =>
      require(m.clusterCenters.length == codebookSize,
        s"subspace $s trained ${m.clusterCenters.length} centers, need $codebookSize " +
          "(corpus too small for this codebookSize)")
    }
    // encoding chains one nearest-centroid assignment per subspace onto
    // a single projection pipeline — ONE pass over the corpus
    val encoded0 = (0 until subspaces).foldLeft(checked) { (acc, s) =>
      models(s).setFeaturesCol("_fv").setPredictionCol(s"_c$s")
        .transform(acc.withColumn("_fv", array_to_vector(slice(col(vecCol), s * dsub + 1, dsub))))
        .drop("_fv")
    }
    // build parameters ride the codes column's schema metadata (the
    // minhash-index convention): a probe with mismatched parameters
    // fails loudly instead of reading wrong ADC slots
    val codesMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.pq.subspaces", subspaces.toLong)
      .putLong("graft.pq.codebookSize", codebookSize.toLong)
      .putLong("graft.pq.dim", dim.toLong)
      .putBoolean("graft.pq.residual", vecCol != "v")
      .build()
    val encoded = encoded0.select(e.columns.map(col) :+
      array((0 until subspaces).map(s => col(s"_c$s")): _*).as("codes", codesMeta): _*)
    val codebook = models.zipWithIndex.flatMap { case (m, s) =>
      m.clusterCenters.toSeq.zipWithIndex.map { case (c, k) => (s, k, c.toArray.toSeq) }
    }.toDF("subspace", "code", "centroid")
    (encoded, codebook)
  }

  /** Validate probe parameters against the build parameters carried in
    * the encoded frame's codes-column metadata (when present — frames
    * assembled by hand without it just skip the check). */
  private def checkPqParams(encoded: DataFrame, subspaces: Int, codebookSize: Int,
                            dim: Int, residual: Boolean): Unit =
    encoded.schema.fields.find(_.name == "codes").foreach { f =>
      if (f.metadata.contains("graft.pq.subspaces")) {
        val (bs, bk, bd) = (f.metadata.getLong("graft.pq.subspaces"),
          f.metadata.getLong("graft.pq.codebookSize"), f.metadata.getLong("graft.pq.dim"))
        require(bs == subspaces && bk == codebookSize && bd == dim,
          s"PQ index was built with subspaces=$bs codebookSize=$bk dim=$bd but the probe " +
            s"asked for subspaces=$subspaces codebookSize=$codebookSize dim=$dim — flat ADC " +
            "positions would not align and the search would return wrong neighbors")
        // residual-ness is a build parameter too: raw codes probed with
        // per-cell residual tables (or vice versa) score in the wrong
        // space and silently collapse recall
        if (f.metadata.contains("graft.pq.residual")) {
          val br = f.metadata.getBoolean("graft.pq.residual")
          require(br == residual,
            s"PQ index codes quantize ${if (br) "RESIDUAL" else "RAW"} vectors but this " +
              s"search scores them in ${if (residual) "residual" else "raw"} space — use " +
              (if (br) "annIvfPqSearch with the matching centroids" else "annPqSearch"))
        }
      }
    }

  /** Flat ADC distance table over the broadcast codebook, one row per
    * distinct `keys` tuple: squared L2 from `vecCol`'s sub-vectors to
    * every (subspace, code) centroid, folded into one array ordered by
    * subspace·K + code. Keyed by q_id for plain PQ; by (q_id, cell)
    * for residual IVFADC, where the probe vector differs per cell. */
  private def adcTable(frame: DataFrame, keys: Seq[String], vecCol: String,
                       codebook: DataFrame, dsub: Int, codebookSize: Int): DataFrame =
    frame.select(keys.map(col) :+ col(vecCol).as("_adcv"): _*)
      .crossJoin(broadcast(codebook))
      .withColumn("d", aggregate(
        zip_with(slice(col("_adcv"), col("subspace") * dsub + 1, lit(dsub)), col("centroid"),
          (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x))
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(
        (col("subspace") * codebookSize + col("code")).as("i"), col("d")))).as("ent"))
      .select(keys.map(col) :+ transform(col("ent"), e => e.getField("d")).as("tab"): _*)

  /** ADC score: m array lookups into the query's flat table. */
  private def adcScore(codes: org.apache.spark.sql.Column,
                       tab: org.apache.spark.sql.Column, codebookSize: Int) =
    aggregate(
      transform(codes, (c, i) => element_at(tab, i * codebookSize + c + 1)),
      lit(0.0), (acc, x) => acc + x)

  /** `nProbe` nearest IVF cells per query over the broadcast centroid
    * table (|c|² − 2·q·c scoring, row_number over skinny rows). */
  private def probeNearestCells(queries: DataFrame, centroids: DataFrame,
                                nProbe: Int): DataFrame = {
    val scored = queries.select(col("q_id"), col("qv"))
      .crossJoin(broadcast(centroids))
      .select(col("q_id"), col("cell"),
        (col("c2") - lit(2.0) * vectors.dot(col("qv"), col("cvec"))).as("d"))
    // nProbe == 1 is EVERY assignment path (index build/append, both
    // SemDeDup tiers, the streaming ingests): argmin as min(struct(d,
    // cell)) — lexicographic struct ordering IS (d asc, cell asc), the
    // same tie-break — with map-side partial aggregation, so the n × k
    // scored rows collapse per partition BEFORE any exchange. The
    // row_number window materialized all n × k rows through a shuffle
    // and per-key sort: 12× wall at 10× corpus on the trained-quantizer
    // path (round 13, measured) — the window stays only for the
    // multi-probe search case, whose n is query-batch-sized
    if (nProbe == 1)
      scored.groupBy(col("q_id"))
        .agg(min(struct(col("d"), col("cell"))).as("_m"))
        .select(col("q_id"), col("_m").getField("cell").as("cell"))
    else {
      val wp = Window.partitionBy(col("q_id")).orderBy(col("d").asc, col("cell").asc)
      scored.withColumn("pr", row_number().over(wp))
        .filter(col("pr") <= nProbe)
        .select(col("q_id"), col("cell"))
    }
  }

  /** Exact cosine rerank of (q_id, c_id) candidates: full vectors
    * refetched BY ID for the survivors only. */
  private def exactRerankById(cands: DataFrame, corpus: DataFrame,
                              queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    Perf.sortedOnce(
      cands
        .join(corpus.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn")), Seq("c_id"))
        .join(broadcast(queries), Seq("q_id"))
        .withColumn("cos", round(
          vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("rank"), col("c_id"), col("cos")),
      col("q_id"), col("rank"))
  }

  /** PQ search via ADC (asymmetric distance computation): each query
    * precomputes a distance table — squared L2 from its sub-vectors to
    * every (subspace, code) centroid, |Q|·m·K skinny rows folded into
    * one flat array per query — and the corpus scan scores each row
    * with m ARRAY LOOKUPS into the broadcast table (no floating-point
    * vector math touches the corpus side at all). Top-`rerank` ADC
    * candidates per query rejoin their full vectors BY ID for exact
    * cosine rerank: the wide vector column is read for rerank·|Q| rows,
    * not the whole corpus. ADC ranks by L2 (monotone with cosine for
    * the roughly-equal-norm embeddings this table holds); the exact
    * rerank makes the final order cosine-true — recall vs brute force
    * is spec-tested like the LSH and IVF paths. */
  /** Day-2 PQ maintenance: encode NEW vectors against the FROZEN
    * persisted codebook table — no KMeans model objects needed, so the
    * parquet codebook alone extends the index (the PQ analog of
    * [[appendToIvfIndex]]). Per subspace the code is the argmin-L2
    * centroid, computed from the same flat distance table the ADC scan
    * uses; ties break to the LOWEST code, matching Spark ML's
    * first-strict-minimum predict rule, so table-encoded codes are
    * IDENTICAL to build-encoded codes (spec-asserted over the whole
    * corpus). Output carries the standard codes metadata, so
    * `checkPqParams` guards mismatched probes exactly as for built
    * rows. */
  def appendToPqIndex(newEmbeddings: DataFrame, codebook: DataFrame,
                      subspaces: Int = 8, codebookSize: Int = 16,
                      dim: Int = 64): DataFrame = {
    require(dim % subspaces == 0, s"dim $dim must divide into $subspaces subspaces")
    val e = prepVectors(newEmbeddings)
      .withColumn("v",
        when(size(col("v")) =!= dim,
          raise_error(concat(lit("appendToPqIndex: vector length "),
            size(col("v")).cast("string"), lit(s" != dim=$dim"))))
          .otherwise(col("v")))
    val tabbed = adcTable(e.select(col("vec_id"), col("v")), Seq("vec_id"), "v",
      codebook, dim / subspaces, codebookSize)
    e.join(tabbed, Seq("vec_id"))
      .select(col("vec_id"), col("v"), col("nrm"),
        argminCodes(subspaces, codebookSize)
          .as("codes", pqCodesMeta(subspaces, codebookSize, dim, residual = false)))
  }

  /** Per-subspace argmin over a flat ADC `tab` column: the code is the
    * position of the segment's minimum distance, ties to the LOWEST
    * code — Spark ML's first-strict-minimum predict rule, so
    * table-encoded codes equal model-encoded codes exactly. */
  private def argminCodes(subspaces: Int, codebookSize: Int): Column =
    array((0 until subspaces).map { s =>
      val seg = slice(col("tab"), s * codebookSize + 1, codebookSize)
      (array_position(seg, array_min(seg)) - 1).cast("int")
    }: _*)

  private def pqCodesMeta(subspaces: Int, codebookSize: Int, dim: Int,
                          residual: Boolean): org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.pq.subspaces", subspaces.toLong)
      .putLong("graft.pq.codebookSize", codebookSize.toLong)
      .putLong("graft.pq.dim", dim.toLong)
      .putBoolean("graft.pq.residual", residual)
      .build()

  /** Day-2 IVFADC maintenance — the composed-index analog of
    * [[appendToIvfIndex]]/[[appendToPqIndex]]: extend the (vec_id, v,
    * nrm, cell, codes) corpus with NEW vectors using ONLY the persisted
    * artifacts (centroid table + residual codebook), no KMeans model
    * objects. Each vector is assigned to its nearest cell by the
    * production probe rule, its RESIDUAL against that cell's centroid
    * is computed, and the residual is encoded against the frozen
    * codebook with the same flat-table argmin the PQ append uses
    * (tie → lowest code). Output rows carry residual=true codes
    * metadata, so a day-2-extended index hits the same checkPqParams
    * guards as built rows. */
  def appendToIvfPqIndex(newEmbeddings: DataFrame, centroids: DataFrame,
                         codebook: DataFrame, subspaces: Int = 8,
                         codebookSize: Int = 16, dim: Int = 64): DataFrame = {
    require(dim % subspaces == 0, s"dim $dim must divide into $subspaces subspaces")
    val assigned = appendToIvfIndex(newEmbeddings, centroids)
      .withColumn("v",
        when(size(col("v")) =!= dim,
          raise_error(concat(lit("appendToIvfPqIndex: vector length "),
            size(col("v")).cast("string"), lit(s" != dim=$dim"))))
          .otherwise(col("v")))
    // materialized once: the ADC distance table AND the final code join
    // both fork from this frame — lazily the cell-assignment window and
    // the residual math would run twice per append
    val resid = assigned
      .join(broadcast(centroids.select(col("cell"), col("cvec"))), Seq("cell"))
      .withColumn("r", vectors.sub(col("v"), col("cvec")))
      .localCheckpoint()
    val tabbed = adcTable(resid.select(col("vec_id"), col("r")), Seq("vec_id"), "r",
      codebook, dim / subspaces, codebookSize)
    val out = resid.join(tabbed, Seq("vec_id"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"),
        argminCodes(subspaces, codebookSize)
          .as("codes", pqCodesMeta(subspaces, codebookSize, dim, residual = true)))
      .localCheckpoint()
    Dedup.freeBlocks(resid)
    out
  }

  def annPqSearch(encoded: DataFrame, codebook: DataFrame, k: Int = 10,
                  numQueries: Int = 5, rerank: Int = 50,
                  subspaces: Int = 8, codebookSize: Int = 16, dim: Int = 64): DataFrame = {
    checkPqParams(encoded, subspaces, codebookSize, dim, residual = false)
    val queries = encoded.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val qtab = broadcast(adcTable(queries, Seq("q_id"), "qv",
      codebook, dim / subspaces, codebookSize))

    // ADC scan: codes only — the corpus's vector column never loads here
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("c_id").asc)
    val cands = encoded.select(col("vec_id").as("c_id"), col("codes"))
      .join(qtab, col("c_id") =!= col("q_id"))
      .withColumn("adist", adcScore(col("codes"), col("tab"), codebookSize))
      .withColumn("ar", row_number().over(wAdc))
      .filter(col("ar") <= rerank)
      .select(col("q_id"), col("c_id"))

    // exact rerank: only the surviving candidates refetch vectors by id
    exactRerankById(cands, encoded, queries, k)
  }

  /** `q47_ann_pq` — product-quantization ANN: [[buildPqIndex]] +
    * [[annPqSearch]] in one shot. Rows-only at the driver (k-means is
    * iterative/seeded); recall vs brute force, code-shape, and the
    * persisted-index round trip are spec-tested. */
  def annPq(spark: SparkSession, dir: String, k: Int = 10, numQueries: Int = 5): DataFrame = {
    val (encoded, codebook) = buildPqIndex(Tables(spark, dir).embeddings)
    annPqSearch(encoded, codebook, k, numQueries)
  }

  /** Formula-chosen PQ codebook: subspace s's entry k is the s-th
    * sub-vector of corpus vector k (k < codebookSize). Continuous
    * embeddings make the entries distinct with probability 1, and ANY
    * engine can regenerate the identical table from the corpus itself
    * — the PQ analog of q79's first-16-vectors centroid choice. */
  private def formulaPqCodebook(e: DataFrame, subspaces: Int, codebookSize: Int,
                                dsub: Int): DataFrame =
    e.filter(col("vec_id") < codebookSize)
      .select(explode(array((0 until subspaces).map { s =>
        struct(lit(s).as("subspace"), col("vec_id").cast("int").as("code"),
          slice(col("v"), s * dsub + 1, dsub).as("centroid"))
      }: _*)).as("cb"))
      .select(col("cb.subspace"), col("cb.code"), col("cb.centroid"))

  /** C7c `q80_ann_pq_portable` — the PQ SEARCH semantics on
    * formula-chosen codebooks ([[formulaPqCodebook]]): the corpus is
    * encoded through the PRODUCTION day-2 rule ([[appendToPqIndex]]:
    * per-subspace argmin-L2 against the frozen codebook table, tie →
    * lowest code) and queries run the production [[annPqSearch]]
    * (per-query flat ADC table, code-only candidate scan, top-`rerank`
    * cut, exact-cosine rerank, cos-desc/id-asc tie-break). KMeans
    * codebook training is the ONLY piece of q47 an oracle can't
    * reproduce, so this twin pins everything else — encode, ADC
    * scoring, candidate cut and rerank all hash-check against a
    * from-scratch DuckDB reformulation (the q79 pattern). */
  def annPqPortable(spark: SparkSession, dir: String, k: Int = 10,
                    numQueries: Int = 5, rerank: Int = 50,
                    subspaces: Int = 8, codebookSize: Int = 16,
                    dim: Int = 64): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val codebook = formulaPqCodebook(prepVectors(emb), subspaces, codebookSize,
      dim / subspaces)
    val encoded = appendToPqIndex(emb, codebook, subspaces, codebookSize, dim)
    annPqSearch(encoded, codebook, k, numQueries, rerank, subspaces, codebookSize, dim)
  }

  /** Composed IVF+PQ search — the production ANN shape at 100 TB: IVF
    * cell pruning bounds WHICH rows are scored (nProbe/nClusters of the
    * corpus), PQ codes bound WHAT the scoring scan reads (m small codes,
    * no vector math), and the exact cosine rerank touches full vectors
    * only for the top candidates, refetched by id. `corpus` carries
    * (vec_id, v, nrm, cell, codes) — both upstream builds are one-time
    * artifacts.
    *
    * Codes quantize per-cell RESIDUALS (classical IVFADC), so each
    * query builds one ADC table per PROBED cell from its residual
    * against that cell's centroid — nProbe small tables per query
    * instead of one, all broadcast. */
  def annIvfPqSearch(corpus: DataFrame, centroids: DataFrame, codebook: DataFrame,
                     k: Int = 10, numQueries: Int = 5, nProbe: Int = 4,
                     rerank: Int = 50,
                     subspaces: Int = 8, codebookSize: Int = 16, dim: Int = 64): DataFrame = {
    checkPqParams(corpus, subspaces, codebookSize, dim, residual = true)
    val queries = corpus.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    // IVF half: nProbe nearest cells. PQ half: the codes quantize
    // RESIDUALS, so the ADC table is per (query, PROBED CELL) — the
    // same query probes each cell with a different offset,
    // qres = qv − cellCentroid. nProbe tables per query, still tiny.
    val qres = probeNearestCells(queries, centroids, nProbe)
      .join(queries.select(col("q_id"), col("qv")), Seq("q_id"))
      .join(broadcast(centroids.select(col("cell"), col("cvec"))), Seq("cell"))
      .withColumn("qres", vectors.sub(col("qv"), col("cvec")))
    val probes = broadcast(adcTable(qres, Seq("q_id", "cell"), "qres",
      codebook, dim / subspaces, codebookSize))

    // candidate scan: probed cells only, codes only
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("c_id").asc)
    val cands = corpus.select(col("cell"), col("vec_id").as("c_id"), col("codes"))
      .join(probes, Seq("cell"))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("adist", adcScore(col("codes"), col("tab"), codebookSize))
      .withColumn("ar", row_number().over(wAdc))
      .filter(col("ar") <= rerank)
      .select(col("q_id"), col("c_id"))

    exactRerankById(cands, corpus, queries, k)
  }

  /** `q48_ann_ivfpq` — the composed scale path in one shot: both index
    * halves build from one materialized projection, join on vec_id, and
    * search with cell pruning + code-only scoring + id-based rerank. */
  def annIvfPq(spark: SparkSession, dir: String, k: Int = 10, numQueries: Int = 5,
               nClusters: Int = 16, nProbe: Int = 4): DataFrame = {
    val (corpus, centroids, codebook) =
      buildIvfPqIndex(Tables(spark, dir).embeddings, nClusters)
    annIvfPqSearch(corpus, centroids, codebook, k, numQueries, nProbe)
  }

  /** C7d `q81_ann_ivfpq_portable` — the composed residual-IVFADC
    * SEARCH semantics on formula-chosen artifacts: centroids are q79's
    * first-16 corpus vectors; the residual codebook's entry (s, k) is
    * the s-th sub-vector of corpus vector (16+k)'s residual against
    * its own assigned cell (the anchors' residuals are identically
    * zero, so the NEXT sixteen vectors provide the entries). The whole
    * corpus is then encoded through the PRODUCTION day-2 path
    * ([[appendToIvfPqIndex]]: probe-rule cell assignment → residual →
    * frozen-codebook argmin) and queries run the production
    * [[annIvfPqSearch]] (per-(query, probed-cell) residual ADC tables,
    * cell-pruned code-only scan, top-`rerank` cut, exact-cosine
    * rerank). With q79 + q80 this pins the entire composed pipeline;
    * only KMeans training itself remains oracle-free. */
  def annIvfPqPortable(spark: SparkSession, dir: String, k: Int = 10,
                       numQueries: Int = 5, nProbe: Int = 4, rerank: Int = 50,
                       subspaces: Int = 8, codebookSize: Int = 16,
                       dim: Int = 64): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val dsub = dim / subspaces
    val centroids = prepVectors(emb).filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("cvec"),
        vectors.dot(col("v"), col("v")).as("c2"))
    val codebook = appendToIvfIndex(
        emb.filter(col("vec_id") >= 16 && col("vec_id") < 16 + codebookSize), centroids)
      .join(broadcast(centroids.select(col("cell"), col("cvec"))), Seq("cell"))
      .select((col("vec_id") - 16).cast("int").as("code"),
        vectors.sub(col("v"), col("cvec")).as("r"))
      .select(explode(array((0 until subspaces).map { s =>
        struct(lit(s).as("subspace"), col("code"),
          slice(col("r"), s * dsub + 1, dsub).as("centroid"))
      }: _*)).as("cb"))
      .select(col("cb.subspace"), col("cb.code"), col("cb.centroid"))
    val corpus = appendToIvfPqIndex(emb, centroids, codebook, subspaces, codebookSize, dim)
    annIvfPqSearch(corpus, centroids, codebook, k, numQueries, nProbe, rerank,
      subspaces, codebookSize, dim)
  }

  /** The composed IVFADC artifact build — IVF coarse quantizer + PQ
    * codebooks over per-cell residuals — as its own one-time step, so
    * day-2 pipelines (and the bench) persist (corpus, centroids,
    * codebook) once and pay only [[annIvfPqSearch]] per query. */
  def buildIvfPqIndex(embeddings: DataFrame, nClusters: Int = 16,
                      seed: Long = 42L): (DataFrame, DataFrame, DataFrame) = {
    // ONE prepared projection feeds both build stages — the cast+norm
    // pass and its materialized blocks are shared, not duplicated
    val e = prepVectors(embeddings).localCheckpoint()
    val (assigned, centroids) = buildIvfIndexFrom(e, nClusters, seed)
    // RESIDUAL quantization (the textbook IVFADC refinement): PQ encodes
    // v − cellCentroid, which is far better concentrated than raw
    // vectors once the coarse quantizer has explained the cell-level
    // structure — the same code budget spends entirely on within-cell
    // detail. ONE materialization: the cell assignment, the broadcast
    // centroid join, and the residual math all land in the resid
    // checkpoint, which the m concurrent codebook fits and the encode
    // pass then read directly.
    val resid = assigned
      .join(broadcast(centroids.select(col("cell"), col("cvec"))), Seq("cell"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"),
        vectors.sub(col("v"), col("cvec")).as("r"))
      .localCheckpoint()
    Dedup.freeBlocks(e)
    val (encoded, codebook) = buildPqIndexFrom(resid, subspaces = 8, codebookSize = 16,
      dim = 64, seed = seed, vecCol = "r")
    // the search reads the corpus in three branches — materialize once
    // and free the superseded residual blocks (centroids/codebook are
    // driver-built; nothing else reads them)
    val corpus = encoded
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"), col("codes"))
      .localCheckpoint()
    Dedup.freeBlocks(resid)
    (corpus, centroids, codebook)
  }

  /** The composed IMI+ADC artifact build (round 14) — the TWO-LEVEL
    * coarse quantizer (C26d) under the residual-PQ memory story (C7d),
    * i.e. the full inverted multi-index system of Babenko & Lempitsky
    * 2012 §5 with Jégou et al. 2011's IVFADC refinement: cells are
    * PRODUCT cells (assignment scores ~2·√cells sub-centroids), and
    * each vector's residual against its product-cell centroid — the
    * CONCATENATION of its two half-centroids — is PQ-encoded. At 100 TB
    * this is the published shape for both costs at once: assignment
    * stays O(n·√cells) and the cells hold m-byte codes, not floats.
    *
    * @return (corpus (vec_id, v, nrm, cell, codes), cent1, cent2,
    *         codebook) — persist all four next to the index */
  def buildImiPqIndex(embeddings: DataFrame, k1: Int = 4, k2: Int = 4,
                      seed: Long = 42L, fitSampleSize: Int = 16384,
                      subspaces: Int = 8, codebookSize: Int = 16,
                      dim: Int = 64): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val e = prepVectors(embeddings).localCheckpoint()
    val (assigned, cent1, cent2) =
      buildTwoLevelFrom(e, e.count(), k1, k2, seed, fitSampleSize)
    // residual against the PRODUCT-cell centroid: the two half
    // centroids concatenate — |v − (c1 ⧺ c2)|² = |v1−c1|² + |v2−c2|²,
    // so the residual is exactly the per-half quantization error
    val resid = assigned
      .withColumn("_c1", (col("cell") / k2).cast("int"))
      .withColumn("_c2", col("cell") % k2)
      .join(broadcast(cent1.select(col("cell").as("_c1"), col("cvec").as("_v1"))), Seq("_c1"))
      .join(broadcast(cent2.select(col("cell").as("_c2"), col("cvec").as("_v2"))), Seq("_c2"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"),
        vectors.sub(col("v"), concat(col("_v1"), col("_v2"))).as("r"))
      .localCheckpoint()
    Dedup.freeBlocks(e)
    val (encoded, codebook) = buildPqIndexFrom(resid, subspaces, codebookSize,
      dim, seed, vecCol = "r")
    val corpus = encoded
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"), col("codes"))
      .localCheckpoint()
    Dedup.freeBlocks(resid)
    (corpus, cent1, cent2, codebook)
  }

  /** Day-2 IMI+ADC maintenance — [[appendToIvfPqIndex]]'s contract on
    * the two-level artifact: new vectors assign through the SHARED
    * per-half argmin rule ([[assignTwoLevel]] — appended rows land in
    * exactly the product cell the build gives them), their residuals
    * against the product-cell centroid encode against the FROZEN
    * persisted codebook (flat-table argmin, tie → lowest code). Only
    * the parquet artifacts are needed; no model objects. */
  def appendToImiPqIndex(newEmbeddings: DataFrame, cent1: DataFrame,
                         cent2: DataFrame, k2: Int, codebook: DataFrame,
                         subspaces: Int = 8, codebookSize: Int = 16,
                         dim: Int = 64): DataFrame = {
    require(dim % subspaces == 0, s"dim $dim must divide into $subspaces subspaces")
    val assigned = assignTwoLevel(prepVectors(newEmbeddings), cent1, cent2, k2)
      .withColumn("v",
        when(size(col("v")) =!= dim,
          raise_error(concat(lit("appendToImiPqIndex: vector length "),
            size(col("v")).cast("string"), lit(s" != dim=$dim"))))
          .otherwise(col("v")))
    val resid = assigned
      .withColumn("_c1", (col("cell") / k2).cast("int"))
      .withColumn("_c2", col("cell") % k2)
      .join(broadcast(cent1.select(col("cell").as("_c1"), col("cvec").as("_v1"))), Seq("_c1"))
      .join(broadcast(cent2.select(col("cell").as("_c2"), col("cvec").as("_v2"))), Seq("_c2"))
      .withColumn("r", vectors.sub(col("v"), concat(col("_v1"), col("_v2"))))
      .localCheckpoint()
    val tabbed = adcTable(resid.select(col("vec_id"), col("r")), Seq("vec_id"), "r",
      codebook, dim / subspaces, codebookSize)
    val out = resid.join(tabbed, Seq("vec_id"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"),
        argminCodes(subspaces, codebookSize)
          .as("codes", pqCodesMeta(subspaces, codebookSize, dim, residual = true)))
      .localCheckpoint()
    Dedup.freeBlocks(resid)
    out
  }

  /** Composed IMI+ADC search — [[annIvfPqSearch]]'s three-stage shape
    * on the two-level index: per-half probing bounds WHICH product
    * cells are scored (nProbe² cells from 2·nProbe sub-centroid
    * scores — the [[annImiSearch]] soundness decomposition), residual
    * ADC tables per (query, probed cell) bound WHAT the scan reads
    * (m codes, no vector math), and the exact cosine rerank refetches
    * full vectors by id for the top candidates only. */
  def annImiPqSearch(corpus: DataFrame, cent1: DataFrame, cent2: DataFrame,
                     k2: Int, codebook: DataFrame,
                     k: Int = 10, numQueries: Int = 5, nProbe: Int = 2,
                     rerank: Int = 50,
                     subspaces: Int = 8, codebookSize: Int = 16,
                     dim: Int = 64): DataFrame = {
    checkPqParams(corpus, subspaces, codebookSize, dim, residual = true)
    require(nProbe >= 1, s"nProbe must be positive, got $nProbe")
    val qs = corpus.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val dim1 = cent1.select(size(col("cvec"))).head().getInt(0)
    val dim2 = cent2.select(size(col("cvec"))).head().getInt(0)
    def halfProbe(hv: Column, cents: DataFrame, name: String) =
      probeNearestCells(
        qs.select(col("q_id"), hv.as("qv")), cents, nProbe)
        .withColumnRenamed("cell", name)
    // nProbe² probed product cells; each probe's ADC table builds from
    // the query's residual against THAT cell's concatenated centroid
    val qres = halfProbe(slice(col("qv"), 1, dim1), cent1, "_c1")
      .join(halfProbe(slice(col("qv"), dim1 + 1, dim2), cent2, "_c2"), Seq("q_id"))
      .join(qs.select(col("q_id"), col("qv")), Seq("q_id"))
      .join(broadcast(cent1.select(col("cell").as("_c1"), col("cvec").as("_v1"))), Seq("_c1"))
      .join(broadcast(cent2.select(col("cell").as("_c2"), col("cvec").as("_v2"))), Seq("_c2"))
      .select(col("q_id"), (col("_c1") * k2 + col("_c2")).as("cell"),
        vectors.sub(col("qv"), concat(col("_v1"), col("_v2"))).as("qres"))
    val probes = broadcast(adcTable(qres, Seq("q_id", "cell"), "qres",
      codebook, dim / subspaces, codebookSize))
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("c_id").asc)
    val cands = corpus.select(col("cell"), col("vec_id").as("c_id"), col("codes"))
      .join(probes, Seq("cell"))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("adist", adcScore(col("codes"), col("tab"), codebookSize))
      .withColumn("ar", row_number().over(wAdc))
      .filter(col("ar") <= rerank)
      .select(col("q_id"), col("c_id"))
    exactRerankById(cands, corpus, qs, k)
  }

  /** Round 16 — the ORACLE BOUNDARY MOVES ONTO THE TRAINED PATH. The
    * deterministic artifact root the oracle-side replay reads: a query
    * run with an `artifactDir` under this root persists its trained
    * centroid/codebook tables here (hive-keyed by [[embeddingsCorpusKey]]
    * so runs at different SFs coexist), and the DuckDB oracle
    * re-derives assignment, encode, ADC search and recall FROM those
    * parquet artifacts — only the KMeans fit itself stays outside the
    * boundary. Contract: the oracle compare must follow the Verify run
    * that wrote the artifacts (the driver's standing order). */
  val TrainedArtifactRoot = "/tmp/graft_trained"

  /** The portable corpus key binding a persisted trained artifact to
    * the EXACT corpus that trained it: Σ ⌊1000·embedding[0]⌋ + count —
    * pure integer arithmetic over exactly-widened floats, so both
    * engines compute the identical long and an artifact from a
    * different SF (or stale run) can never be silently adopted. */
  private[graft] def embeddingsCorpusKey(raw: DataFrame): Long =
    raw.agg((sum(floor(element_at(col("embedding"), 1).cast("double") * 1000)
      .cast("long")) + count(lit(1))).as("k")).first().getLong(0)

  /** [[embeddingsCorpusKey]]'s documents-table sibling:
    * Σ length(text) + count (chars — the corpus is ASCII by contract,
    * and both engines count identically). */
  private[graft] def documentsCorpusKey(docs: DataFrame): Long =
    docs.agg((sum(length(col("text")).cast("long")) + count(lit(1))).as("k"))
      .first().getLong(0)

  /** Persist one trained artifact table under its corpus key and read
    * it back — everything downstream of the returned frame is a
    * deterministic function of parquet bytes the oracle can also
    * read. */
  private[graft] def persistTrainedArtifact(df: DataFrame, path: String,
                                            key: Long): DataFrame = {
    val full = s"$path/k=$key"
    df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(full)
    df.sparkSession.read.parquet(full)
  }

  /** `q140_ann_imipq` — the full composed system in one shot: two-level
    * coarse build + residual PQ + IMI-probed ADC search, at the
    * PRODUCTION operating point (codebookSize 64 — SCALING_r15's
    * documented recommendation, registered now that the oracle reads
    * artifacts and its cost no longer grows with the codebook).
    *
    * With `artifactDir` (the registered form, round 16): the trained
    * sub-quantizers and codebook PERSIST under [[TrainedArtifactRoot]],
    * the corpus re-encodes from the reloaded artifacts through the
    * production day-2 path ([[appendToImiPqIndex]] — build==append
    * parity is spec-pinned), and the search runs from those artifacts —
    * so the DuckDB oracle replays assignment, residuals, encode, ADC
    * and rerank from the SAME parquet bytes, and only the KMeans fits
    * stay outside the oracle boundary (closing the r15 formula-twin
    * understatement: twins measured 24.8 % where the trained system
    * reads 38.6 %). Without it: the in-memory build, for specs and
    * benches. */
  def annImiPq(spark: SparkSession, dir: String, k: Int = 10,
               numQueries: Int = 5, k1: Int = 4, k2: Int = 4,
               nProbe: Int = 2, codebookSize: Int = 64,
               artifactDir: Option[String] = None): DataFrame = {
    val raw = Tables(spark, dir).embeddings
    val (corpus0, c10, c20, cb0) =
      buildImiPqIndex(raw, k1, k2, codebookSize = codebookSize)
    artifactDir match {
      case None =>
        annImiPqSearch(corpus0, c10, c20, k2, cb0, k, numQueries, nProbe,
          codebookSize = codebookSize)
      case Some(root) =>
        val key = embeddingsCorpusKey(raw)
        val c1 = persistTrainedArtifact(c10, s"$root/cent1", key)
        val c2 = persistTrainedArtifact(c20, s"$root/cent2", key)
        val cb = persistTrainedArtifact(cb0, s"$root/codebook", key)
        val corpus = appendToImiPqIndex(raw, c1, c2, k2, cb,
          codebookSize = codebookSize)
        annImiPqSearch(corpus, c1, c2, k2, cb, k, numQueries, nProbe,
          codebookSize = codebookSize)
    }
  }

  /** C7f `q175_ann_trained_recall` — [[annRecall]] of the TRAINED
    * IMI+ADC system (q140's artifact-backed chain, production knobs)
    * at ADC rerank cuts 10 and 50 against exact brute force: the
    * trained tier joins the q161–q168 meter family, with the oracle
    * replaying search + recall FROM the persisted artifacts — the
    * operating point a deployment actually ships is now the one the
    * meter certifies (r15's documented cb16-default-vs-cb64-production
    * tension closed). Monotone by the same exact-rerank superset
    * dominance as q164. */
  def annImiPqTrainedRecallReport(spark: SparkSession, dir: String,
                                  k: Int = 10, numQueries: Int = 5,
                                  artifactDir: String =
                                    s"$TrainedArtifactRoot/imipq"): DataFrame =
    annImiPqTrainedRecallSplit(spark, dir, k, numQueries, artifactDir)()

  /** [[annImiPqTrainedRecallReport]] split at the artifact boundary
    * (the bench build-stamp convention, round 18): the CALL adopts or
    * builds+persists the trained artifacts, encodes the corpus through
    * the day-2 append path and materializes the brute-force truth; the
    * returned closure runs the two search tiers + recall — the
    * recurring per-query-batch cost. The registered query composes the
    * two verbatim. */
  private[graft] def annImiPqTrainedRecallSplit(spark: SparkSession, dir: String,
                                  k: Int = 10, numQueries: Int = 5,
                                  artifactDir: String =
                                    s"$TrainedArtifactRoot/imipq"): () => DataFrame = {
    val raw = Tables(spark, dir).embeddings
    val key = embeddingsCorpusKey(raw)
    // adopt the artifacts the q140 run persisted for THIS corpus key
    // (Verify runs queries name-sorted, so q140 precedes q175 in the
    // gate); when absent — a standalone run — build and persist them
    // ourselves. Never overwrite an existing key: q140's oracle compare
    // reads these same bytes.
    def artPath(name: String) = s"$artifactDir/$name/k=$key"
    val fs = new org.apache.hadoop.fs.Path(artifactDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(artPath("codebook"), "_SUCCESS"))) {
      val (_, c10, c20, cb0) = buildImiPqIndex(raw, 4, 4, codebookSize = 64)
      persistTrainedArtifact(c10, s"$artifactDir/cent1", key)
      persistTrainedArtifact(c20, s"$artifactDir/cent2", key)
      persistTrainedArtifact(cb0, s"$artifactDir/codebook", key)
    }
    def art(name: String) = spark.read.parquet(artPath(name))
    val (c1, c2, cb) = (art("cent1"), art("cent2"), art("codebook"))
    val corpus = appendToImiPqIndex(raw, c1, c2, k2 = 4, cb, codebookSize = 64)
      .localCheckpoint()
    val truth = annBruteForce(spark, dir, k, numQueries).localCheckpoint()
    def tier(rerank: Int): DataFrame =
      annRecall(truth,
        annImiPqSearch(corpus, c1, c2, 4, cb, k, numQueries, nProbe = 2,
          rerank = rerank, codebookSize = 64), k)
        .withColumn("tier", lit(f"trained_r$rerank%02d"))
    () => Perf.sortedOnce(
      tier(10).unionByName(tier(50))
        .select(col("tier"), col("q_id"), col("k"), col("n_hits"), col("recall_bp")),
      col("tier"), col("q_id"))
  }

  /** C7d→C26d `q141_ann_imipq_portable` — the composed IMI+ADC SEARCH
    * semantics on formula artifacts (q81's convention composed with
    * q139's): sub-quantizer cells are the first 4 corpus vectors'
    * halves (per half), the residual codebook's entry (s, k) is the
    * s-th sub-vector of corpus vector (16+k)'s residual against its
    * own assigned PRODUCT-cell centroid, the whole corpus encodes
    * through the production day-2 path ([[appendToImiPqIndex]]), and
    * queries run the production [[annImiPqSearch]]. Every stage —
    * per-half argmins, product arithmetic, residuals, codebook,
    * flat-table encode, per-probe ADC, rerank — re-derives from
    * scratch in the DuckDB oracle, hash-exact. */
  def annImiPqPortable(spark: SparkSession, dir: String, k: Int = 10,
                       numQueries: Int = 5, nProbe: Int = 2, rerank: Int = 50,
                       k1: Int = 4, k2: Int = 4,
                       subspaces: Int = 8, codebookSize: Int = 16,
                       dim: Int = 64): DataFrame =
    annImiPqPortableSplit(spark, dir, k, numQueries, nProbe, rerank,
      k1, k2, subspaces, codebookSize, dim)()

  /** [[annImiPqPortable]] split at the index boundary (the bench
    * build-stamp convention, round 18): the CALL derives the formula
    * sub-quantizers + codebook and encodes the corpus (the one-time
    * index build); the returned closure runs the production search —
    * the recurring per-query-batch cost. The registered query composes
    * the two verbatim. */
  private[graft] def annImiPqPortableSplit(
                       spark: SparkSession, dir: String, k: Int = 10,
                       numQueries: Int = 5, nProbe: Int = 2, rerank: Int = 50,
                       k1: Int = 4, k2: Int = 4,
                       subspaces: Int = 8, codebookSize: Int = 16,
                       dim: Int = 64): () => DataFrame = {
    val search = annImiPqPortableBuild(spark, dir, k, numQueries, nProbe,
      k1, k2, subspaces, codebookSize, dim)
    () => search(rerank)
  }

  /** [[annImiPqPortableSplit]]'s build half with the RERANK knob left
    * open (r19): the q164 recall report runs BOTH rerank tiers against
    * ONE encoded corpus — the cut is applied at search time, so
    * re-encoding per tier was pure duplicate work. */
  private[graft] def annImiPqPortableBuild(
                       spark: SparkSession, dir: String, k: Int = 10,
                       numQueries: Int = 5, nProbe: Int = 2,
                       k1: Int = 4, k2: Int = 4,
                       subspaces: Int = 8, codebookSize: Int = 16,
                       dim: Int = 64): Int => DataFrame = {
    val e = prepVectors(Tables(spark, dir).embeddings).localCheckpoint()
    val h = dim / 2
    def halfCent(first: Boolean, kk: Int) = {
      val hv = if (first) slice(col("v"), 1, h) else slice(col("v"), h + 1, dim - h)
      e.filter(col("vec_id") < kk)
        .select(col("vec_id").cast("int").as("cell"), hv.as("cvec"),
          vectors.dot(hv, hv).as("c2"))
    }
    val cent1 = halfCent(first = true, k1).localCheckpoint()
    val cent2 = halfCent(first = false, k2).localCheckpoint()
    // formula residual codebook: vectors 16..31's residuals against
    // their own product-cell centroid, sliced per subspace
    val dsub = dim / subspaces
    val codebook = assignTwoLevel(
        e.filter(col("vec_id") >= 16 && col("vec_id") < 16 + codebookSize),
        cent1, cent2, k2)
      .withColumn("_c1", (col("cell") / k2).cast("int"))
      .withColumn("_c2", col("cell") % k2)
      .join(broadcast(cent1.select(col("cell").as("_c1"), col("cvec").as("_v1"))), Seq("_c1"))
      .join(broadcast(cent2.select(col("cell").as("_c2"), col("cvec").as("_v2"))), Seq("_c2"))
      .select((col("vec_id") - 16).cast("int").as("code"),
        vectors.sub(col("v"), concat(col("_v1"), col("_v2"))).as("r"))
      .select(explode(array((0 until subspaces).map { s =>
        struct(lit(s).as("subspace"), col("code"),
          slice(col("r"), s * dsub + 1, dsub).as("centroid"))
      }: _*)).as("cb"))
      .select(col("cb.subspace"), col("cb.code"), col("cb.centroid"))
    val cbMat = codebook.localCheckpoint()
    val corpus = appendToImiPqIndex(Tables(spark, dir).embeddings,
      cent1, cent2, k2, cbMat, subspaces, codebookSize, dim)
      .localCheckpoint()
    (rerank: Int) => annImiPqSearch(corpus, cent1, cent2, k2, cbMat, k,
      numQueries, nProbe, rerank, subspaces, codebookSize, dim)
  }

  /** C7 `q26_ann_lsh` — sign-random-projection LSH ANN: 16 hyperplanes,
    * 4 bands of 4 bits. The corpus is bucketed ONCE by (band, band-bits)
    * — at scale this bucketing is computed in a single map pass and can
    * be persisted as a bucketed table; queries join their buckets and
    * rerank candidates by exact cosine. Recall vs the C6 baseline is
    * spec-tested (SimilaritySpec). */
  def annLsh(spark: SparkSession, dir: String, k: Int = 10, numQueries: Int = 5,
             numPlanes: Int = 16, bands: Int = 4, dim: Int = 64): DataFrame =
    annLshWith(spark, dir, hyperplanes(numPlanes, dim), k, numQueries, bands)

  /** ±1 (Rademacher) hyperplanes derived from md5("j:d") — the
    * portable-plane family for [[annLshPortable]]: sign projection
    * against random-SIGN vectors is a valid SimHash-style LSH family,
    * and the md5 formula lets ANY engine regenerate the identical
    * planes, so the whole signature→band→candidate→rerank pipeline
    * becomes oracle-checkable. The low bit of the first hex nibble is
    * the repo's md5-convention analog of a fair coin per (plane, dim).
    */
  def md5SignPlanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { j =>
      (0 until dim).map { d =>
        val h = md.digest(s"$j:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (((h(0) >> 4) & 1) == 1) 1.0 else -1.0
      }
    }
  }

  /** C7 `q78_ann_lsh_portable` — [[annLsh]] with the md5-sign plane
    * family instead of the LCG Gaussian-ish one: the ONLY difference is
    * the plane constants, so the q26 pipeline's semantics (signatures,
    * banding, bucket join, dedup, exact-cosine rerank, tie-break) are
    * certified by the DuckDB oracle that regenerates the planes from
    * the shared formula (the q74/q77 portable-twin pattern). Sign
    * parity is EXACT across engines: both fold the dot product in
    * index order over identical doubles. */
  def annLshPortable(spark: SparkSession, dir: String, k: Int = 10,
                     numQueries: Int = 5, numPlanes: Int = 16,
                     bands: Int = 4, dim: Int = 64): DataFrame =
    annLshWith(spark, dir, md5SignPlanes(numPlanes, dim), k, numQueries, bands)

  private def annLshWith(spark: SparkSession, dir: String,
                         planes: Seq[Seq[Double]], k: Int, numQueries: Int,
                         bands: Int): DataFrame = {
    val t = Tables(spark, dir)
    val numPlanes = planes.size
    val rows = numPlanes / bands
    val e = t.embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bits", signBits(col("v"), planes))
    val banded = e.select(col("vec_id"), col("v"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("", transform(slice(col("bits"), b * rows + 1, rows), x => x.cast("string"))).as("bh"))
      }: _*)).as("bk"))
      .select(col("vec_id"), col("v"), col("bk.band"), col("bk.bh"))
    val qs = broadcast(banded.filter(col("vec_id") < numQueries)
      .select(col("band"), col("bh"), col("vec_id").as("q_id"), col("v").as("qv")))
    // Query vectors stay on the candidate side too (only self-matches are
    // dropped) so this path answers the same question as annBruteForce —
    // the recall spec compares the two directly.
    val cand = banded
      .select(col("band"), col("bh"), col("vec_id").as("c_id"), col("v").as("cv"))
      .join(qs, Seq("band", "bh"))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"), col("qv"), col("cv")).distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    cand
      .withColumn("cos", round(vectors.cosine(col("qv"), col("cv")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .transform(d => Perf.sortedOnce(
        d.select(col("q_id"), col("rank"), col("c_id"), col("cos")),
        col("q_id"), col("rank")))
  }

  // ---- C26: semantic dedup (SemDeDup) ------------------------------

  /** Semantic (embedding-space) dedup — the SemDeDup recipe (Abbas et
    * al. 2023, arXiv:2303.09540): cluster the corpus with a coarse
    * quantizer, then compare pairs ONLY within a cluster, so the pair
    * count is Σ|cell|² instead of |corpus|² — the property that makes
    * embedding dedup feasible at 100 TB. A doc is a semantic duplicate
    * iff a LOWER-ID doc in the same cell is within `threshold` rounded
    * cosine; `dup_of` is the smallest such id (keep-lowest-id is the
    * repo's deterministic stand-in for the paper's arbitrary-keep —
    * same clusters, engine-portable verdicts).
    *
    * Centroids arrive as the SAME (cell, cvec, c2) artifact the IVF
    * index persists — ONE trained quantizer serves ANN search and
    * semantic dedup — and assignment is the production day-2 rule
    * ([[appendToIvfIndex]]: argmin |c|²−2·v·c, tie → lower cell), so a
    * doc deduplicates in exactly the cell a search probe would find it
    * in.
    *
    * Skew guard (the candidate-generation invariant): a cell of size B
    * yields O(B²) pairs and no partition-level mechanism can shrink
    * that count, so cells above `maxCellSize` fail LOUDLY — an in-plan
    * raise_error riding the cell column, the scd2Merge convention —
    * instead of silently exploding the join; the fix is retraining the
    * quantizer with more cells. */
  def semanticDedup(embeddings: DataFrame, centroids: DataFrame,
                    threshold: Double = 0.25,
                    maxCellSize: Int = 10000): DataFrame =
    semanticDedupAssigned(appendToIvfIndex(embeddings, centroids),
      threshold, maxCellSize)

  /** [[semanticDedup]] over an ALREADY-ASSIGNED corpus ((vec_id, v,
    * nrm, cell) — [[buildIvfIndex]]'s first half, or the persisted
    * cell-bucketed index table): skips the re-assignment pass entirely,
    * so a pipeline that just trained the quantizer (q134) or reads the
    * persisted index pays zero duplicate assignment work — at 100 TB
    * the assignment scan is the second-largest cost after the pairing
    * itself, and the index artifact already carries its result. */
  def semanticDedupAssigned(assignedIn: DataFrame,
                            threshold: Double = 0.25,
                            maxCellSize: Int = 10000): DataFrame = {
    require(threshold > -1 && threshold <= 1,
      s"threshold must lie in (-1, 1], got $threshold")
    require(maxCellSize > 0, s"maxCellSize must be positive, got $maxCellSize")
    // MATERIALIZED: the census, both pair sides and the verdict join
    // all fork this frame — lazily the upstream assignment (or KMeans
    // transform) would run four times per job
    val assigned = assignedIn.localCheckpoint()
    val census = assigned.groupBy(col("cell")).agg(count(lit(1)).as("_csz"))
    val sized = assigned.join(broadcast(census), Seq("cell"))
      .withColumn("cell",
        when(col("_csz") > maxCellSize,
          raise_error(concat(lit("semanticDedup: cell "), col("cell").cast("string"),
            lit(" holds "), col("_csz").cast("string"),
            lit(s" vectors (maxCellSize $maxCellSize) — retrain the quantizer with more cells"))))
          .otherwise(col("cell")))
    def side(s: String) = sized.select(col("cell"),
      col("vec_id").as(s"id_$s"), col("v").as(s"v$s"), col("nrm").as(s"n$s"))
    // threshold compares the 4-dp ROUNDED cosine (the q24 convention)
    // so verdicts are engine-independent under float summation-order
    // differences
    val dups = side("a").join(side("b"), Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(
        vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cos") >= threshold)
      .groupBy(col("id_b").as("vec_id"))
      .agg(min(col("id_a")).as("dup_of"))
    Perf.sortedOnce(
      assigned.select(col("vec_id"), col("cell"))
        .join(dups, Seq("vec_id"), "left")
        .withColumn("is_dup", col("dup_of").isNotNull)
        .select(col("vec_id"), col("cell"), col("is_dup"), col("dup_of")),
      col("vec_id"))
  }

  /** C26 `q85_semantic_dedup` — [[semanticDedup]] on the q79
    * formula-chosen centroid artifact (the first 16 corpus vectors), so
    * the ENTIRE pipeline — production assignment rule, within-cell
    * pairing, rounded-cosine threshold, keep-lowest-id verdict — is
    * directly oracle-backed by a from-scratch DuckDB reformulation.
    * Production use feeds [[buildIvfIndex]] centroids instead (KMeans
    * training is planted-cluster-certified in SimilaritySpec); the two
    * differ ONLY in where the centroid table comes from. */
  def semanticDedupPortable(spark: SparkSession, dir: String,
                            threshold: Double = 0.25): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    semanticDedup(emb, formulaCentroids(emb), threshold)
  }

  /** Day-2 semantic dedup — [[semanticDedup]]'s incremental shape, the
    * C2b/q71 convention lifted to the embedding tier: each ingest
    * batch probes the PERSISTED assigned corpus ((vec_id, v, nrm,
    * cell) — [[buildIvfIndex]]'s first half, bucketed by cell) instead
    * of re-pairing the whole corpus. New vectors assign by the
    * production probe rule, compare ONLY against their own cell's
    * members, and verdict on the 4-dp rounded cosine. The corpus side
    * never exchanges when the index is read cell-bucketed; only the
    * (small) batch shuffles.
    *
    * Batch-vs-corpus only, like [[graft.operators.Dedup.dedupAgainstIndex]]:
    * within-batch duplicates surface when the accepted batch appends
    * and the NEXT batch probes — run [[semanticDedup]] over the batch
    * alone first when same-batch collisions matter.
    *
    * The cell-size guard runs on the INDEX at query time (an appended
    * index's cell sizes aren't knowable at build time): cells past
    * `maxCellSize` fail loudly in-plan — retrain the quantizer.
    *
    * @return one verdict row per batch vector: (vec_id, cell, is_dup,
    *         dup_of = smallest matching corpus id or -1, best_cos =
    *         highest matching cosine or -1) */
  def semanticDedupAgainstIndex(newEmbeddings: DataFrame, assigned: DataFrame,
                                centroids: DataFrame, threshold: Double = 0.25,
                                maxCellSize: Int = 10000): DataFrame =
    semanticDedupAgainstIndexAssigned(appendToIvfIndex(newEmbeddings, centroids),
      assigned, threshold, maxCellSize)

  /** [[semanticDedupAgainstIndex]] with the batch ALREADY assigned —
    * the entry point for indexes whose assignment rule is not the flat
    * probe (the two-level/IMI index: assign the batch with
    * [[assignTwoLevel]] against the persisted sub-quantizers, then
    * probe here), and for callers that persisted the batch assignment
    * anyway. Batch and index must share ONE assignment rule or cells
    * won't line up — that pairing is the caller's contract exactly as
    * the quantizer artifact itself is. */
  def semanticDedupAgainstIndexAssigned(probeAssigned: DataFrame,
                                        assigned: DataFrame,
                                        threshold: Double = 0.25,
                                        maxCellSize: Int = 10000): DataFrame = {
    require(threshold > -1 && threshold <= 1,
      s"threshold must lie in (-1, 1], got $threshold")
    require(maxCellSize > 0, s"maxCellSize must be positive, got $maxCellSize")
    // MATERIALIZED (the semanticDedup convention): the probe forks into
    // the match join and the verdict select — lazily its assignment
    // would run twice per job
    val probe = probeAssigned.localCheckpoint()
    val census = assigned.groupBy(col("cell")).agg(count(lit(1)).as("_csz"))
    val corpus = assigned.join(broadcast(census), Seq("cell"))
      .withColumn("cell",
        when(col("_csz") > maxCellSize,
          raise_error(concat(lit("semanticDedupAgainstIndex: cell "),
            col("cell").cast("string"), lit(" holds "), col("_csz").cast("string"),
            lit(s" vectors (maxCellSize $maxCellSize) — retrain the quantizer"))))
          .otherwise(col("cell")))
      .select(col("cell"), col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val matches = probe
      .join(corpus, Seq("cell"))
      .withColumn("cos", round(
        vectors.dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 4))
      .filter(col("cos") >= threshold)
      .groupBy(col("vec_id"))
      .agg(min(col("c_id")).as("_dup_of"), max(col("cos")).as("_best"))
    Perf.sortedOnce(
      probe.select(col("vec_id"), col("cell"))
        .join(matches, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"),
          col("_dup_of").isNotNull.as("is_dup"),
          coalesce(col("_dup_of"), lit(-1L)).as("dup_of"),
          coalesce(col("_best"), lit(-1.0)).as("best_cos")),
      col("vec_id"))
  }

  /** Day-2 semantic dedup against a TWO-LEVEL (IMI) index, with the
    * PROBE-SIDE recall knob (round 14): the batch assigns per half at
    * its top-`nProbe` sub-cells and verdicts against all nProbe²
    * PRODUCT cells, while the index's build assignment stays nProbe=1
    * — the artifact is untouched, only probes widen. This buys back
    * the boundary-pair recall the √cells assignment trades away
    * (Babenko & Lempitsky's documented cost; SCALING_r13 measured it
    * as 24 vs flat's 25 dups at 30× — one near-dup pair split across
    * product cells): a probe whose half sits just across a sub-cell
    * boundary from its twin still reaches the twin's product cell at
    * nProbe=2. Squared distance decomposes over the halves, so the
    * per-half top-nProbe probe set provably contains the nProbe²-best
    * product centroids (the [[annImiSearch]] soundness argument).
    *
    * Scale shape: the corpus never shuffles (cell-bucketed reads, the
    * probe set broadcasts); probe cost is nProbe² candidate cells per
    * batch vector — at nProbe=2 that is 4 cells of ~targetCellSize
    * members each, still ≪ the flat path's cells-per-vector scoring.
    *
    * Reported `cell` is the HOME (nProbe=1) product cell — the cell
    * [[appendToIvfIndexTwoLevel]] would append the vector to, so
    * accept-and-append pipelines stay consistent with the build rule.
    *
    * @return one verdict row per batch vector, the
    *         [[semanticDedupAgainstIndex]] shape: (vec_id, cell,
    *         is_dup, dup_of|-1, best_cos|-1) */
  def semanticDedupAgainstImiIndex(newEmbeddings: DataFrame, assigned: DataFrame,
                                   cent1: DataFrame, cent2: DataFrame, k2: Int,
                                   threshold: Double = 0.25,
                                   maxCellSize: Int = 10000,
                                   nProbe: Int = 2): DataFrame = {
    require(threshold > -1 && threshold <= 1,
      s"threshold must lie in (-1, 1], got $threshold")
    require(maxCellSize > 0, s"maxCellSize must be positive, got $maxCellSize")
    require(nProbe >= 1, s"nProbe must be positive, got $nProbe")
    // MATERIALIZED: the home assignment, the probe fan-out and the
    // verdict select all fork the batch
    val home = assignTwoLevel(prepVectors(newEmbeddings), cent1, cent2, k2)
      .localCheckpoint()
    val dim1 = cent1.select(size(col("cvec"))).head().getInt(0)
    val dim2 = cent2.select(size(col("cvec"))).head().getInt(0)
    def halfProbe(hv: Column, cents: DataFrame, name: String) =
      probeNearestCells(
        home.select(col("vec_id").as("q_id"), hv.as("qv")), cents, nProbe)
        .withColumnRenamed("cell", name)
    // nProbe² probed product cells per vector, vectors carried along
    val probes = halfProbe(slice(col("v"), 1, dim1), cent1, "_c1")
      .join(halfProbe(slice(col("v"), dim1 + 1, dim2), cent2, "_c2"), Seq("q_id"))
      .select(col("q_id"), (col("_c1") * k2 + col("_c2")).as("cell"))
      .join(home.select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn")), Seq("q_id"))
    val census = assigned.groupBy(col("cell")).agg(count(lit(1)).as("_csz"))
    val corpus = assigned.join(broadcast(census), Seq("cell"))
      .withColumn("cell",
        when(col("_csz") > maxCellSize,
          raise_error(concat(lit("semanticDedupAgainstImiIndex: cell "),
            col("cell").cast("string"), lit(" holds "), col("_csz").cast("string"),
            lit(s" vectors (maxCellSize $maxCellSize) — retrain the quantizer"))))
          .otherwise(col("cell")))
      .select(col("cell"), col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    // each corpus vector lives in exactly ONE cell, so a candidate can
    // never be scored twice across the probed cells — min/max are safe
    val matches = corpus
      .join(broadcast(probes), Seq("cell"))
      .withColumn("cos", round(
        vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
      .filter(col("cos") >= threshold)
      .groupBy(col("q_id").as("vec_id"))
      .agg(min(col("c_id")).as("_dup_of"), max(col("cos")).as("_best"))
    Perf.sortedOnce(
      home.select(col("vec_id"), col("cell"))
        .join(matches, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"),
          col("_dup_of").isNotNull.as("is_dup"),
          coalesce(col("_dup_of"), lit(-1L)).as("dup_of"),
          coalesce(col("_best"), lit(-1.0)).as("best_cos")),
      col("vec_id"))
  }

  /** C26b `q98_semantic_dedup_probe` — [[semanticDedupAgainstIndex]]
    * with the q71 80/20 split on the q79 formula centroids (built from
    * the CORPUS side, the artifact a day-2 batch actually probes), so
    * assignment, cell pairing, verdict and both sentinels are
    * oracle-backed end-to-end. Production feeds [[buildIvfIndex]]
    * artifacts; the two differ only in where the centroids came from. */
  def semanticDedupProbePortable(spark: SparkSession, dir: String,
                                 threshold: Double = 0.25): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val corpus = emb.filter(col("vec_id") % 5 =!= 4)
    val batch = emb.filter(col("vec_id") % 5 === 4)
    val centroids = formulaCentroids(corpus)
    // materialized: the index frame is scanned twice (census + corpus
    // side); production reads it from a persisted bucketed table
    val assigned = appendToIvfIndex(corpus, centroids).localCheckpoint()
    semanticDedupAgainstIndex(batch, assigned, centroids, threshold)
  }

  /** C26d `q139_semdedup_imi_portable` — the TWO-LEVEL SemDeDup SHAPE
    * oracle-backed (the q85↔q134 relationship reproduced for the IMI
    * tier): FORMULA sub-quantizers — cell j of each half is vector j's
    * own half, j < k — replace the KMeans fits, so the per-half argmin
    * assignment, the `c1 · k2 + c2` product-cell arithmetic, the
    * within-cell pairing and the keep-lowest-id verdict are ALL
    * re-derivable from scratch in DuckDB and hash-checked. Production
    * feeds [[buildIvfIndexTwoLevel]] artifacts instead; the two differ
    * ONLY in where the sub-centroid tables came from. */
  def semanticDedupImiPortable(spark: SparkSession, dir: String,
                               k1: Int = 4, k2: Int = 4,
                               threshold: Double = 0.25): DataFrame = {
    val e = prepVectors(Tables(spark, dir).embeddings).localCheckpoint()
    val dim = e.select(size(col("v"))).head().getInt(0)
    val h = dim / 2
    def halfCent(first: Boolean, k: Int) = {
      val hv = if (first) slice(col("v"), 1, h) else slice(col("v"), h + 1, dim - h)
      e.filter(col("vec_id") < k)
        .select(col("vec_id").cast("int").as("cell"), hv.as("cvec"),
          vectors.dot(hv, hv).as("c2"))
    }
    val assigned = assignTwoLevel(e,
      halfCent(first = true, k1), halfCent(first = false, k2), k2)
    semanticDedupAssigned(assigned, threshold)
  }

  /** The q79 formula-chosen centroid table (first `n` corpus vectors as
    * cells) shared by every *Portable twin — deterministic, so the
    * full pipeline stays reproducible from scratch in an external
    * engine. Production paths feed [[buildIvfIndex]] output instead. */
  private[graft] def formulaCentroids(embeddings: DataFrame, n: Int = 16): DataFrame =
    prepVectors(embeddings).filter(col("vec_id") < n)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("cvec"),
        vectors.dot(col("v"), col("v")).as("c2"))

  // ---- C29: cluster-balanced sampling (density-based pruning) ------

  /** Cluster-balanced corpus sampling — the data-PRUNING operator from
    * the scaling-law literature (Sorscher et al. 2022, "Beyond neural
    * scaling laws", arXiv:2206.14486; applied to LLM corpora in D4,
    * Tirumala et al. 2023, arXiv:2308.12284 — both public): rank every
    * vector by prototypicality (cosine to its cluster centroid) and
    * keep a per-CELL fraction, so selection pressure applies inside
    * every semantic region instead of letting a global score empty the
    * small clusters — the failure mode of global top-k pruning.
    * `keepHard = false` keeps the most prototypical members (denoised
    * cores; the scarce-data regime), `true` keeps the hardest
    * (boundary examples; the abundant-data regime) — the paper's
    * central finding is that which end to keep depends on the
    * data-per-parameter budget, so the knob is explicit.
    *
    * Same artifact economics as [[semanticDedup]]: centroids are the
    * persisted IVF quantizer table, assignment is the production
    * [[appendToIvfIndex]] rule, and the whole pass is one broadcast
    * join + one per-cell window — no corpus self-join anywhere, and
    * the per-cell frame never exceeds the quantizer's cell size. Ranks
    * compare the 4-dp ROUNDED cosine (ties → lower vec_id), the q24
    * convention, so kept sets are engine-portable.
    *
    * Output: (vec_id, cell, cos_c, cell_rank) for the KEPT rows —
    * ceil(fraction·|cell|) per cell, so every non-empty cell retains
    * at least one representative. */
  def clusterBalancedSample(embeddings: DataFrame, centroids: DataFrame,
                            fraction: Double,
                            keepHard: Boolean = false): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    val assigned = appendToIvfIndex(embeddings, centroids)
    val scored = assigned
      .join(broadcast(centroids.select(col("cell"), col("cvec"),
        sqrt(col("c2")).as("cnrm"))), Seq("cell"))
      .withColumn("cos_c", round(
        vectors.dot(col("v"), col("cvec")) / (col("nrm") * col("cnrm")), 4))
    val order = if (keepHard) Seq(col("cos_c").asc, col("vec_id").asc)
                else Seq(col("cos_c").desc, col("vec_id").asc)
    val w = Window.partitionBy(col("cell")).orderBy(order: _*)
    val wc = Window.partitionBy(col("cell"))
    scored
      .withColumn("cell_rank", row_number().over(w).cast("long"))
      .withColumn("_keep", ceil(lit(fraction) * count(lit(1)).over(wc)))
      .filter(col("cell_rank") <= col("_keep"))
      .select(col("vec_id"), col("cell"), col("cos_c"), col("cell_rank"))
      .transform(d => Perf.sortedOnce(d, col("vec_id")))
  }

  /** C29 `q88_cluster_sample` — [[clusterBalancedSample]] keeping the
    * most prototypical quarter of every cell, on the q79
    * formula-chosen centroids: assignment, scoring, per-cell ranking
    * and the ceil-keep rule are all directly oracle-backed. Production
    * use feeds [[buildIvfIndex]] centroids; the two differ only in
    * where the centroid table comes from. */
  def clusterSamplePortable(spark: SparkSession, dir: String,
                            fraction: Double = 0.25): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    clusterBalancedSample(emb, formulaCentroids(emb), fraction)
  }
}

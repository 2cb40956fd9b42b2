package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions.{array, col, explode, lit, slice, struct}

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("brute-force ANN returns k well-ordered neighbors per query") {
    val out = Similarity.annBruteForce(spark, sfDir, k = 10, numQueries = 3)
      .as[(Long, Long, Long, Double)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      assert(rows.length == 10)
      val sims = rows.sortBy(_._2).map(_._4)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "cos must be non-increasing in rank")
    }
  }

  test("LSH ANN recall vs brute force is useful") {
    val k = 10
    val bf = Similarity.annBruteForce(spark, sfDir, k = k, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val lsh = Similarity.annLsh(spark, sfDir, k = k, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val recalls = bf.map { case (q, truth) =>
      val got = lsh.getOrElse(q, Set.empty)
      got.intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // sign-random-projection at 16 planes / 4 bands over near-uniform
    // vectors: recall is modest by design; the scale path reranks exactly,
    // so the spec guards against a broken bucketing (recall ~ k/N ≈ 0.02).
    assert(mean >= 0.2, s"mean recall $mean too low — bucketing likely broken")
  }

  test("portable md5-sign LSH planes are balanced and keep useful recall") {
    // the Rademacher family must behave like the LCG one: fair-ish ±1
    // coins (a stuck md5 bit would collapse every bucket) and the same
    // recall floor vs brute force as the q26 family
    val planes = Similarity.md5SignPlanes(16, 64)
    assert(planes.size == 16 && planes.forall(_.size == 64))
    val pos = planes.flatten.count(_ == 1.0)
    assert(pos > 400 && pos < 624, s"md5 sign bias: $pos/1024 positive")
    val k = 10
    val bf = Similarity.annBruteForce(spark, sfDir, k = k, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val lsh = Similarity.annLshPortable(spark, sfDir, k = k, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val recalls = bf.map { case (q, truth) =>
      lsh.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean recall $mean too low — portable bucketing broken")
  }

  test("portable IVF twin: anchor vectors own their cells, recall is useful") {
    // each centroid-vector must land in its own cell — its
    // self-distance −|v|² is the Cauchy-Schwarz minimum, so any other
    // outcome means the assignment rule broke
    val out = Similarity.annIvfPortable(spark, sfDir, k = 10, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect()
    val emb = graft.Tables(spark, sfDir).embeddings
    val centroids = Similarity.prepVectors(emb).filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("cvec"),
        graft.functions.vectors.dot(col("v"), col("v")).as("c2"))
    val anchorCells = Similarity.appendToIvfIndex(emb.filter(col("vec_id") < 16), centroids)
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect()
    anchorCells.foreach { case (id, cell) =>
      assert(cell.toLong == id, s"anchor $id assigned to foreign cell $cell")
    }
    val bf = Similarity.annBruteForce(spark, sfDir, k = 10, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val got = out.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val recalls = bf.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean recall $mean too low for nProbe=4/16 cells")
  }

  test("portable PQ twin: anchor vectors encode to their own codes, recall is useful") {
    // codebook entry k of subspace s IS vector k's s-th sub-vector, so
    // vector k (k < 16) must encode to codes = [k, k, ..., k] — its
    // self-distance 0.0 is the exact minimum in every subspace; any
    // other outcome means the table-encode argmin rule broke
    val emb = graft.Tables(spark, sfDir).embeddings
    val e = Similarity.prepVectors(emb)
    val codebook = e.filter(col("vec_id") < 16)
      .select(explode(array((0 until 8).map { s =>
        struct(lit(s).as("subspace"), col("vec_id").cast("int").as("code"),
          slice(col("v"), s * 8 + 1, 8).as("centroid"))
      }: _*)).as("cb"))
      .select(col("cb.subspace"), col("cb.code"), col("cb.centroid"))
    val anchorCodes = Similarity.appendToPqIndex(emb.filter(col("vec_id") < 16), codebook)
      .select(col("vec_id"), col("codes")).as[(Long, Seq[Int])].collect()
    anchorCodes.foreach { case (id, codes) =>
      assert(codes.forall(_.toLong == id),
        s"anchor $id encoded to foreign codes ${codes.mkString(",")}")
    }
    val bf = Similarity.annBruteForce(spark, sfDir, k = 10, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val got = Similarity.annPqPortable(spark, sfDir, k = 10, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val recalls = bf.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // 16 arbitrary corpus vectors are a WEAK codebook (no training), but
    // the top-50 ADC cut + exact rerank still recovers most of the true
    // top-10 — this floor guards encode/ADC plumbing, not codebook quality
    assert(mean >= 0.2, s"mean recall $mean too low — portable PQ encode/ADC broken")
  }

  test("IVF ANN recall vs brute force is useful and candidate set is cell-bounded") {
    val k = 10
    val bf = Similarity.annBruteForce(spark, sfDir, k = k, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val ivf = Similarity.annIvf(spark, sfDir, k = k, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val recalls = bf.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // 4 of 16 cells probed → ~1/4 of the corpus scanned per query; on
    // near-uniform vectors the true neighbors concentrate in the probed
    // cells, so recall should beat the scanned fraction by a wide margin
    assert(mean >= 0.3, s"mean IVF recall $mean too low — quantizer or probing broken")
    // and the reported neighbors must be genuine: every IVF cosine equals
    // the brute-force cosine for the same (q, c) pair where both appear
    val bfCos = Similarity.annBruteForce(spark, sfDir, k = k, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect().map(r => (r._1, r._3) -> r._4).toMap
    Similarity.annIvf(spark, sfDir, k = k, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect().foreach { case (q, _, c, cos) =>
        bfCos.get((q, c)).foreach(b => assert(b == cos, s"cosine mismatch for ($q,$c)"))
      }
  }

  test("IVF index persists (bucketed cells + centroid parquet) and searches identically") {
    // build-once / reuse-many: the assigned corpus round-trips through a
    // cell-bucketed table and the centroids through parquet; a search
    // over the reloaded index must equal the direct search exactly —
    // repeated query batches then skip the KMeans fit AND the
    // cell-assignment pass entirely.
    val (assigned, centroids) = Similarity.buildIvfIndex(Tables(spark, sfDir).embeddings)
    val direct = Similarity.annIvfSearch(assigned, centroids)
      .as[(Long, Long, Long, Double)].collect().toSeq
    graft.sources.Bucketing.writeBucketed(assigned, "ivf_cells", Seq("cell"), 8)
    val centDir = java.nio.file.Files.createTempDirectory("graft_ivf_cent").toString
    centroids.write.mode("overwrite").parquet(centDir)
    val reloaded = Similarity.annIvfSearch(
      spark.table("ivf_cells"), spark.read.parquet(centDir))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(reloaded == direct, "persisted index must reproduce the direct search")
  }

  test("IVF append assigns new vectors to the quantizer's nearest cells, search finds them") {
    import org.apache.spark.sql.functions._
    val all = Tables(spark, sfDir).embeddings
    // build on the first 400 ids, append the rest WITHOUT re-fitting
    val (assigned, centroids) = Similarity.buildIvfIndex(all.filter(col("vec_id") < 400))
    val appended = Similarity.appendToIvfIndex(all.filter(col("vec_id") >= 400), centroids)
    // every appended cell must be the argmin-distance cell under the
    // SAME centroid table (computed independently here)
    val check = appended.as("a")
      .crossJoin(broadcast(centroids.withColumnRenamed("cell", "ccell")))
      .withColumn("d", col("c2") - lit(2.0) * graft.functions.vectors.dot(col("a.v"), col("cvec")))
      .withColumn("best", min_by(col("ccell"), struct(col("d"), col("ccell")))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("a.vec_id"))))
      .filter(col("ccell") === col("a.cell"))
      .select(col("a.vec_id"), (col("ccell") === col("best")).as("ok"))
      .as[(Long, Boolean)].collect()
    assert(check.nonEmpty && check.forall(_._2), "appended rows must land in the argmin cell")
    // an appended vector is findable: search the unioned index with a
    // query that exists only in the appended half
    val union = assigned.unionByName(appended)
    val out = Similarity.annIvfSearch(union, centroids, k = 5, numQueries = 450, nProbe = 4)
      .as[(Long, Long, Long, Double)].collect()
    val fromAppended = out.filter(_._3 >= 400)
    assert(fromAppended.nonEmpty, "appended vectors must be reachable as neighbors")
    assert(out.exists(_._1 >= 400), "appended vectors must be queryable")
  }

  test("PQ append encodes via the codebook table identically to the build encoding") {
    import org.apache.spark.sql.functions._
    val all = Tables(spark, sfDir).embeddings
    val (encoded, codebook) = Similarity.buildPqIndex(all)
    // re-encode the ENTIRE corpus from the persisted codebook alone:
    // every code array must match the KMeans-model encoding bit for bit
    val centDir = java.nio.file.Files.createTempDirectory("graft_pq_cb").toString
    codebook.write.mode("overwrite").parquet(centDir)
    val reEncoded = Similarity.appendToPqIndex(all, spark.read.parquet(centDir))
    val mismatch = encoded.select(col("vec_id"), col("codes").as("built"))
      .join(reEncoded.select(col("vec_id"), col("codes").as("appended")), Seq("vec_id"))
      .filter(col("built") =!= col("appended"))
      .count()
    assert(mismatch == 0, s"$mismatch/${all.count()} code arrays differ")
    // appended rows carry valid build metadata: a search over them
    // passes checkPqParams and returns ranked neighbors
    val out = Similarity.annPqSearch(reEncoded, codebook, k = 3, numQueries = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty && out.forall(_._2 <= 3))
  }

  test("IVFADC day-2 append re-encodes the built corpus identically from persisted artifacts") {
    import org.apache.spark.sql.functions._
    val all = Tables(spark, sfDir).embeddings
    val (corpus, centroids, codebook) = Similarity.buildIvfPqIndex(all)
    // re-derive the ENTIRE corpus from the persisted artifacts alone
    // (no KMeans model objects): cells and residual codes must match
    // the build bit for bit — the appendToPqIndex parity contract,
    // extended to the composed index
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_art").toString
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    codebook.write.mode("overwrite").parquet(s"$dir/codebook")
    val re = Similarity.appendToIvfPqIndex(all,
      spark.read.parquet(s"$dir/centroids"), spark.read.parquet(s"$dir/codebook"))
    val mismatch = corpus.select(col("vec_id"), col("cell").as("bc"), col("codes").as("bcodes"))
      .join(re.select(col("vec_id"), col("cell").as("ac"), col("codes").as("acodes")), Seq("vec_id"))
      .filter(col("bc") =!= col("ac") || col("bcodes") =!= col("acodes"))
      .count()
    assert(mismatch == 0, s"$mismatch rows differ between build and day-2 re-encode")
    // appended rows carry residual=true metadata: the composed search
    // accepts them, and the raw-space search rejects them loudly
    val out = Similarity.annIvfPqSearch(re, centroids, codebook, k = 3, numQueries = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty && out.forall(_._2 <= 3))
    intercept[IllegalArgumentException] {
      Similarity.annPqSearch(re, codebook, k = 3, numQueries = 2)
    }
  }

  test("portable IVFADC twin: returns ranked neighbors with useful recall") {
    val bf = Similarity.annBruteForce(spark, sfDir, k = 10, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val got = Similarity.annIvfPqPortable(spark, sfDir, k = 10, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val recalls = bf.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // untrained centroids AND untrained residual codebook stack two
    // approximations; this floor guards the assignment/encode/ADC
    // plumbing (broken ≈ k/N ≈ 0.02), not artifact quality — semantic
    // exactness is the q81 oracle's job
    assert(mean >= 0.1, s"mean recall $mean too low — composed portable pipeline broken")
  }

  // The one computation q79/q80/q81 deliberately leave uncertified is
  // KMeans TRAINING itself (the q36 quantizer and the q47/q48
  // codebooks). Certify it here on planted ground truth: 16 clusters
  // whose centers differ by ≥ 4.0 in EVERY dimension (and in every
  // 8-dim subspace) with ±0.01 jitter — a separation/diameter ratio
  // where Lloyd's must recover the planted partition exactly, or the
  // training is broken. Deterministic seed → no flake.
  test("KMeans training recovers planted separable clusters: IVF quantizer and PQ codebooks") {
    import org.apache.spark.sql.functions._
    val nClusters = 16; val perCluster = 50; val dim = 64
    def center(k: Int, d: Int): Double = ((k * 31 + d * 17) % 16).toDouble * 4.0
    val pts = for (k <- 0 until nClusters; i <- 0 until perCluster) yield {
      val id = (k * perCluster + i).toLong
      val v = Array.tabulate(dim) { d =>
        center(k, d) + ((id * 13 + d * 7) % 5 - 2).toDouble * 0.005
      }
      (id, k, v.toSeq)
    }
    val emb = pts.toDF("vec_id", "planted", "embedding")

    // IVF quantizer: the planted partition must be recovered exactly
    val (assigned, centroids) = Similarity.buildIvfIndex(emb, nClusters = nClusters)
    val purity = assigned
      .join(emb.select(col("vec_id"), col("planted")), Seq("vec_id"))
      .groupBy(col("planted")).agg(countDistinct(col("cell")).as("ncells"),
        first(col("cell")).as("cell"))
      .collect()
    assert(purity.forall(_.getLong(1) == 1L),
      s"split planted clusters: ${purity.filter(_.getLong(1) != 1L).mkString(", ")}")
    assert(purity.map(_.getInt(2)).distinct.length == nClusters,
      "two planted clusters merged into one cell")
    // and every planted center is recovered to within the jitter scale
    // (inter-center gaps are ≥ 4·√64 ≈ 32 in L2 — 0.1 is conclusive)
    val recovered = centroids.select(col("cvec")).collect()
      .map(_.getSeq[Double](0).toArray)
    (0 until nClusters).foreach { k =>
      val truth = Array.tabulate(dim)(center(k, _))
      val best = recovered.map(c =>
        math.sqrt(c.zip(truth).map { case (a, b) => (a - b) * (a - b) }.sum)).min
      assert(best < 0.1, s"planted center $k not recovered: nearest centroid at L2 $best")
    }

    // PQ codebooks: train k=16 over EIGHT planted sub-patterns per
    // subspace — k exactly equal to the tight-cluster count can land in
    // a merged/split local optimum (seen at k=16/16: one subspace merged
    // a pair), which is a property of Lloyd's, not a training bug.
    // Over-provisioned k must (a) recover every planted sub-centroid
    // and (b) quantize every point with distortion at jitter scale.
    val pqPts = for (k <- 0 until 8; i <- 0 until 100) yield {
      val id = (k * 100 + i).toLong
      val v = Array.tabulate(dim) { d =>
        center(k, d) + ((id * 13 + d * 7) % 5 - 2).toDouble * 0.005
      }
      (id, k, v.toSeq)
    }
    val pqEmb = pqPts.toDF("vec_id", "planted", "embedding")
    val (encoded, codebook) = Similarity.buildPqIndex(pqEmb)
    val cbRows = codebook.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val cbBySub = cbRows.groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    for (s <- 0 until 8; k <- 0 until 8) {
      val truth = Array.tabulate(8)(j => center(k, s * 8 + j))
      val best = cbBySub(s).map(c =>
        math.sqrt(c.zip(truth).map { case (a, b) => (a - b) * (a - b) }.sum)).min
      assert(best < 0.1, s"subspace $s planted sub-centroid $k not recovered (L2 $best)")
    }
    val cbByCode = cbRows.map(r => (r._1, r._2) -> r._3).toMap
    encoded.select(col("v"), col("codes")).collect().foreach { r =>
      val v = r.getSeq[Double](0).toArray
      val codes = r.getSeq[Int](1)
      for (s <- 0 until 8) {
        val c = cbByCode((s, codes(s)))
        val dist = math.sqrt((0 until 8)
          .map(j => (v(s * 8 + j) - c(j)) * (v(s * 8 + j) - c(j))).sum)
        assert(dist < 0.1,
          s"quantization distortion $dist in subspace $s — codebook lost a planted pattern")
      }
    }
  }

  test("IVF search plan carries no literal centroid arrays (index is a table, not plan text)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.ArrayType
    val (assigned, centroids) = Similarity.buildIvfIndex(Tables(spark, sfDir).embeddings)
    val out = Similarity.annIvfSearch(assigned, centroids)
    // a production index has 10⁴–10⁵ cells × dim doubles; none of that
    // may ride the plan as literals (the r4 watch item)
    val bigArrayLits = out.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case l: Literal if l.dataType.isInstanceOf[ArrayType] && l.value != null &&
          l.value.asInstanceOf[ArrayData].numElements() > 8 => l
      })
    }.flatten
    assert(bigArrayLits.isEmpty,
      s"IVF search plan embeds ${bigArrayLits.size} literal arrays — centroids must stay a table")
  }

  test("PQ ANN: recall vs brute force, true cosines, code shape, persisted round trip") {
    val k = 10
    val bf = Similarity.annBruteForce(spark, sfDir, k = k, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect()
    val truth = bf.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val (encoded, codebook) = Similarity.buildPqIndex(Tables(spark, sfDir).embeddings)
    // encoded shape: m codes per vector, each within the codebook
    val codeRows = encoded.select("codes").as[Seq[Int]].collect()
    assert(codeRows.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    val pq = Similarity.annPqSearch(encoded, codebook)
      .as[(Long, Long, Long, Double)].collect()
    val got = pq.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val recalls = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    // 8 subspaces × 16 codes with a 50-candidate exact rerank: the ADC
    // ordering concentrates true neighbors far above the random k/N
    assert(mean >= 0.4, s"mean PQ recall $mean too low — codebooks or ADC lookup broken")
    // a corpus whose vectors are LONGER than the declared dim must fail
    // the build loudly — slice would otherwise quantize only the first
    // dim components and silently degrade ADC recall
    import spark.implicits._
    val wide = (0 until 40).map(i => (i.toLong, Seq.fill(8)(i * 0.1))).toDF("vec_id", "embedding")
    val dimEx = intercept[Exception] {
      Similarity.buildPqIndex(wide, subspaces = 2, codebookSize = 2, dim = 4)
    }
    assert(dimEx.getMessage.contains("vector length") ||
        Option(dimEx.getCause).exists(_.getMessage.contains("vector length")),
      s"dim mismatch must raise the length guard, got: ${dimEx.getMessage}")
    // reported cosines are genuine (match brute force where both appear)
    val bfCos = bf.map(r => (r._1, r._3) -> r._4).toMap
    pq.foreach { case (q, _, c, cos) =>
      bfCos.get((q, c)).foreach(b => assert(b == cos, s"cosine mismatch for ($q,$c)"))
    }
    // build-once / reuse-many: parquet round trip reproduces the search
    val encDir = java.nio.file.Files.createTempDirectory("graft_pq_enc").toString
    val cbDir = java.nio.file.Files.createTempDirectory("graft_pq_cb").toString
    encoded.write.mode("overwrite").parquet(encDir)
    codebook.write.mode("overwrite").parquet(cbDir)
    val reloaded = Similarity.annPqSearch(
      spark.read.parquet(encDir), spark.read.parquet(cbDir))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(reloaded == pq.toSeq, "persisted PQ index must reproduce the search")
    // probing with parameters the index wasn't built with fails loudly —
    // build params ride the codes column's metadata through parquet
    val ex = intercept[IllegalArgumentException] {
      Similarity.annPqSearch(spark.read.parquet(encDir), spark.read.parquet(cbDir),
        codebookSize = 8)
    }
    assert(ex.getMessage.contains("built with"), ex.getMessage)
  }

  test("IVF+PQ composition: recall survives cell pruning plus code-only scoring") {
    val k = 10
    val bf = Similarity.annBruteForce(spark, sfDir, k = k, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect()
    val truth = bf.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val out = Similarity.annIvfPq(spark, sfDir, k = k, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect()
    val got = out.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val recalls = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    // two approximations stack (4/16 cells scanned, ADC ordering), so
    // the floor sits below the single-approximation paths — but far
    // above the random k/N ≈ 0.02 a broken composition would score
    assert(mean >= 0.3, s"mean IVF+PQ recall $mean too low")
    // cosines still genuine
    val bfCos = bf.map(r => (r._1, r._3) -> r._4).toMap
    out.foreach { case (q, _, c, cos) =>
      bfCos.get((q, c)).foreach(b => assert(b == cos, s"cosine mismatch for ($q,$c)"))
    }
    // residual-ness is a build parameter: RAW-code indexes (the q47
    // builder) hand-joined into an IVF corpus must be REJECTED by the
    // residual search — scoring raw codes against per-cell residual
    // tables would silently collapse recall
    val (assigned, centroids) = Similarity.buildIvfIndex(Tables(spark, sfDir).embeddings)
    val (rawEnc, rawCb) = Similarity.buildPqIndex(Tables(spark, sfDir).embeddings)
    val rawCorpus = rawEnc.join(assigned.select("vec_id", "cell"), Seq("vec_id"))
    val ex = intercept[IllegalArgumentException] {
      Similarity.annIvfPqSearch(rawCorpus, centroids, rawCb)
    }
    assert(ex.getMessage.contains("RAW"), ex.getMessage)
  }

  test("near-dup join is label-blocked, not cross") {
    val plan = Similarity.embeddingNearDup(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  /** Deterministic pseudo-random 64-dim vector for planted-truth tests. */
  private def vec(seed: Int): Seq[Float] = {
    var s = seed.toLong * 2654435761L + 1
    Seq.fill(64) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 40).toDouble / (1L << 24).toDouble - 0.5).toFloat
    }
  }

  test("near-dup caps oversized label blocks via LSH sub-buckets") {
    // one label block of 31 vectors, cap 10 → block must NOT all-pairs join
    val rows = (0 until 30).map(i => (i.toLong, 1, vec(i))) :+ ((100L, 1, vec(7)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val exact = Similarity.embeddingNearDupFrame(df, threshold = 0.9, blockCap = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = Similarity.embeddingNearDupFrame(df, threshold = 0.9, blockCap = 10)
    val cappedPairs = capped.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cappedPairs.contains((7L, 100L)),
      "identical pair must survive LSH sub-bucketing (shares every band)")
    assert(cappedPairs.subsetOf(exact), "capped path must not invent pairs")
    assert(!capped.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("default blockCap is exact at test scale (no block exceeds it)") {
    val dflt = Similarity.embeddingNearDup(spark, sfDir)
      .as[(Int, Long, Long, Double)].collect().toSeq
    val uncapped = Similarity.embeddingNearDup(spark, sfDir, blockCap = Int.MaxValue)
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(dflt == uncapped)
  }

  // ---- semantic dedup (SemDeDup) -----------------------------------

  /** Two planted clusters around e1 and e2 (4-dim): cell-0 holds a
    * tight dup pair (10,11) plus a trailing near copy (14), a mid
    * vector (12) below threshold to the pair but tight with (13), and
    * the pair (13, 22) is near-identical but SPLIT across cells — the
    * documented SemDeDup miss mode. */
  private def plantedSemanticCorpus = {
    val rows = Seq(
      (10L, Seq(1.00, 0.010, 0.0, 0.0)),
      (11L, Seq(1.00, 0.020, 0.0, 0.0)),
      (12L, Seq(0.60, 0.580, 0.0, 0.0)),
      (13L, Seq(0.75, 0.700, 0.0, 0.0)),
      (14L, Seq(1.00, 0.015, 0.0, 0.0)),
      (20L, Seq(0.010, 1.00, 0.0, 0.0)),
      (21L, Seq(0.020, 1.00, 0.0, 0.0)),
      (22L, Seq(0.70, 0.750, 0.0, 0.0)))
    rows.toDF("vec_id", "embedding")
  }

  private def axisCentroids = Seq(
    (0, Seq(1.0, 0.0, 0.0, 0.0), 1.0),
    (1, Seq(0.0, 1.0, 0.0, 0.0), 1.0)
  ).toDF("cell", "cvec", "c2")

  test("semantic dedup: within-cell verdicts, keep-lowest-id, cross-cell miss mode") {
    val out = Similarity.semanticDedup(plantedSemanticCorpus, axisCentroids,
        threshold = 0.85)
      .as[(Long, Int, Boolean, Option[Long])].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.map(_._1).sorted == Seq(10L, 11L, 12L, 13L, 14L, 20L, 21L, 22L),
      "every vector gets exactly one verdict row")
    // assignment follows the production argmin rule
    assert(out.filter(_._2 == 0).map(_._1).toSet == Set(10L, 11L, 12L, 13L, 14L))
    assert(out.filter(_._2 == 1).map(_._1).toSet == Set(20L, 21L, 22L))
    // tight pair: 11 dups onto 10; 14 is near BOTH 10 and 11 → the
    // keep-lowest-id verdict must pick min(10, 11) = 10
    assert(byId(11L)._3 && byId(11L)._4.contains(10L))
    assert(byId(14L)._3 && byId(14L)._4.contains(10L))
    // 12 is below threshold to every LOWER cell-mate → kept
    assert(!byId(12L)._3 && byId(12L)._4.isEmpty)
    // 13 is near only 12 among lower ids → dup_of = 12
    assert(byId(13L)._3 && byId(13L)._4.contains(12L))
    // cluster anchors are never dups of anything
    assert(!byId(10L)._3 && !byId(20L)._3)
    assert(byId(21L)._3 && byId(21L)._4.contains(20L))
    // (13, 22) have cosine ≈ 0.998 but sit in DIFFERENT cells — the
    // SemDeDup contract compares within a cell only, so 22 is kept
    assert(!byId(22L)._3 && byId(22L)._4.isEmpty)
  }

  test("day-2 semantic dedup probes only its own cell and reports both sentinels") {
    val corpus = Similarity.appendToIvfIndex(plantedSemanticCorpus, axisCentroids)
    val batch = Seq(
      (100L, Seq(1.00, 0.010, 0.0, 0.0)), // identical to corpus 10 → dup, cos 1
      (101L, Seq(0.0, 0.0, 1.0, 0.0)),    // orthogonal to everything → clean
      (102L, Seq(0.015, 1.00, 0.0, 0.0))  // tight to 20/21 → dup_of min = 20
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedupAgainstIndex(batch, corpus, axisCentroids,
        threshold = 0.85)
      .as[(Long, Int, Boolean, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(100L)._3 && out(100L)._4 == 10L && out(100L)._5 == 1.0,
      s"identical vector must dup onto its twin: ${out(100L)}")
    assert(out(102L)._3 && out(102L)._4 == 20L, s"${out(102L)}")
    assert(!out(101L)._3 && out(101L)._4 == -1L && out(101L)._5 == -1.0,
      s"clean vector carries both sentinels: ${out(101L)}")
    // corpus rows never verdict (batch-vs-corpus only)
    assert(out.keySet == Set(100L, 101L, 102L))
    // oversize guard runs on the INDEX census
    val e = intercept[Exception] {
      Similarity.semanticDedupAgainstIndex(batch, corpus, axisCentroids,
        threshold = 0.85, maxCellSize = 3).collect()
    }
    def msg(t: Throwable) = Option(t.getMessage).getOrElse("") +
      Option(t.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg(e).contains("retrain"), s"wrong error: ${msg(e)}")
  }

  test("semantic dedup: oversized cells fail loudly instead of exploding the pair join") {
    val e = intercept[Exception] {
      Similarity.semanticDedup(plantedSemanticCorpus, axisCentroids,
        threshold = 0.85, maxCellSize = 3).collect()
    }
    def msg(t: Throwable) = Option(t.getMessage).getOrElse("") +
      Option(t.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg(e).contains("semanticDedup") && msg(e).contains("retrain"),
      s"wrong error: ${msg(e)}")
  }

  test("semantic dedup pair join is cell-blocked, not cross") {
    val plan = Similarity.semanticDedupPortable(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("semantic dedup portable twin is self-consistent on real embeddings") {
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val out = Similarity.semanticDedupPortable(spark, sfDir)
      .as[(Long, Int, Boolean, Option[Long])].collect().toSeq
    assert(out.size.toLong == n, "one verdict row per corpus vector")
    assert(out.map(_._2).forall(c => c >= 0 && c < 16), "cells come from the 16 anchors")
    out.foreach { case (id, _, isDup, dupOf) =>
      assert(isDup == dupOf.isDefined)
      dupOf.foreach(d => assert(d < id, "dup_of must be a LOWER surviving id"))
    }
    // dup_of targets sit in the same cell as their duplicates
    val cellOf = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (id, cell, _, dupOf) =>
      dupOf.foreach(d => assert(cellOf(d) == cell, s"$id dups onto $d across cells"))
    }
  }

  // ---- C29: cluster-balanced sampling ------------------------------

  test("cluster sampling keeps a per-cell ceil fraction, prototypes first") {
    // cell 0 holds 5 members (10-14), cell 1 holds 3 (20-22);
    // fraction 0.5 → keep 3 and 2 — selection is per cell, so the
    // small cluster cannot be emptied by the big one's scores
    val out = Similarity.clusterBalancedSample(
        plantedSemanticCorpus, axisCentroids, fraction = 0.5)
      .as[(Long, Int, Double, Long)].collect().toSeq
    val byCell = out.groupBy(_._2)
    assert(byCell(0).size == 3 && byCell(1).size == 2)
    // prototypes = highest cosine to the centroid: in cell 0 the tight
    // axis-aligned trio (10, 11, 14) outranks the diagonal 12/13; in
    // cell 1 the anchors (20, 21) outrank the diagonal 22
    assert(byCell(0).map(_._1).toSet == Set(10L, 11L, 14L))
    assert(byCell(1).map(_._1).toSet == Set(20L, 21L))
    // ranks are contiguous from 1 within each cell
    assert(byCell(0).map(_._4).sorted == Seq(1L, 2L, 3L))
    assert(byCell(1).map(_._4).sorted == Seq(1L, 2L))
  }

  test("cluster sampling keepHard=true flips to the boundary examples") {
    val out = Similarity.clusterBalancedSample(
        plantedSemanticCorpus, axisCentroids, fraction = 0.5, keepHard = true)
      .as[(Long, Int, Double, Long)].collect().toSeq
    val byCell = out.groupBy(_._2)
    // hardest = lowest cosine to the centroid: the diagonal vectors
    // (12, 13 in cell 0; 22 in cell 1) lead, then the least-tight
    // axis vector fills the ceil quota
    assert(byCell(0).map(_._1).toSet == Set(11L, 12L, 13L),
      s"cell 0 hard picks: ${byCell(0).map(_._1).sorted}")
    assert(byCell(1).map(_._1).toSet == Set(21L, 22L),
      s"cell 1 hard picks: ${byCell(1).map(_._1).sorted}")
  }

  test("cluster sampling at fraction 1.0 keeps everything; bad fractions are refused") {
    val all = Similarity.clusterBalancedSample(
        plantedSemanticCorpus, axisCentroids, fraction = 1.0)
      .collect()
    assert(all.length == 8)
    val e = intercept[IllegalArgumentException] {
      Similarity.clusterBalancedSample(plantedSemanticCorpus, axisCentroids, 0.0)
    }
    assert(e.getMessage.contains("fraction"))
  }

  test("cluster sampling plan is one broadcast join + windows, no self-join") {
    val plan = Similarity.clusterSamplePortable(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "sampling must never pair corpus rows with each other")
  }

  test("two-level quantizer: product cells split both halves, day-2 append lands identically, stride mismatch refuses") {
    // 4-dim vectors over a 2x2 product structure: the first half
    // separates {A, B}, the second {X, Y} - the flat view of these
    // four groups needs 4 centroids, the two-level view 2 + 2
    def v(a: Double, b: Double, x: Double, y: Double) = Seq(a, b, x, y)
    val pts = Seq(
      (0L, v(10, 0, 10, 0)), (1L, v(10, 0, 0, 10)),
      (2L, v(0, 10, 10, 0)), (3L, v(0, 10, 0, 10)),
      (4L, v(11, 0, 11, 0)), (5L, v(11, 0, 0, 11)),
      (6L, v(0, 11, 11, 0)), (7L, v(0, 11, 0, 11))
    ).toDF("vec_id", "embedding")
    val (assigned, c1, c2) = Similarity.buildIvfIndexTwoLevel(pts, 2, 2)
    val cells = assigned.select(col("vec_id"), col("cell"))
      .as[(Long, Int)].collect().toMap
    // all four product cells populated, pairs land together
    assert(cells.values.toSet.size == 4, s"expected 4 product cells: $cells")
    assert(cells(0L) == cells(4L) && cells(1L) == cells(5L) &&
      cells(2L) == cells(6L) && cells(3L) == cells(7L), s"grouping broke: $cells")
    // the product arithmetic is c1 * k2 + c2 - every cell < k1 * k2
    assert(cells.values.forall(c => c >= 0 && c < 4), s"cells out of range: $cells")
    // day-2 append: a twin of vec 0 lands in exactly vec 0's cell
    val twin = Seq((100L, v(10, 0, 10, 0))).toDF("vec_id", "embedding")
    val appended = Similarity.appendToIvfIndexTwoLevel(twin, c1, c2, k2 = 2)
      .select(col("cell")).as[Int].head()
    assert(appended == cells(0L), s"append must reproduce the build cell: $appended vs ${cells(0L)}")
    // a wrong k2 stride would alias product cells - loud refusal
    intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndexTwoLevel(twin, c1, c2, k2 = 3).collect()
    }
    // day-2 semantic probe against the IMI index: assign the batch
    // with the SAME two-level rule, then the shared probe body - the
    // twin verdicts as a dup of vec 0, an orthogonal vector stays clean
    val batch = Seq((100L, v(10, 0, 10, 0)), (101L, v(5, 5, 5, 5)))
      .toDF("vec_id", "embedding")
    val probed = Similarity.semanticDedupAgainstIndexAssigned(
      Similarity.appendToIvfIndexTwoLevel(batch, c1, c2, k2 = 2),
      assigned, threshold = 0.99)
      .select(col("vec_id"), col("is_dup"), col("dup_of"))
      .as[(Long, Boolean, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(probed(100L) == ((true, 0L)), s"the twin must dup onto 0: $probed")
    assert(probed(101L)._1 == false, s"the diagonal vector (cos 0.707 to every group) stays clean: $probed")
  }

  test("buildVectorIndexAuto: structure picked from the corpus, day-2 rules dispatch per structure") {
    val emb = graft.Tables(spark, sfDir).embeddings
    def twinOf(id: Long) = emb.filter(col("vec_id") === id)
      .select(lit(9000L).as("vec_id"), col("embedding"))
    def check(ix: Similarity.VectorIndex): Unit = {
      val donorCell = ix.assigned.filter(col("vec_id") === 5L)
        .select(col("cell")).as[Int].head()
      // the structure's shared rule: a twin lands in its donor's cell
      val appended = ix.assign(twinOf(5L)).select(col("cell")).as[Int].head()
      assert(appended == donorCell, s"twin must land in the donor's cell: $appended vs $donorCell")
      // the structure's probe: the twin verdicts as a dup of the donor
      val v = ix.dedupProbe(twinOf(5L), ix.assigned, threshold = 0.9999)
        .select(col("is_dup"), col("dup_of")).as[(Boolean, Long)].head()
      assert(v == ((true, 5L)), s"twin must dup onto its donor: $v")
    }
    // 500 vectors / 125 → 4 cells → flat
    val flat = Similarity.buildVectorIndexAuto(emb)
    assert(flat.isInstanceOf[Similarity.FlatVectorIndex],
      s"below the crossover auto must build flat: $flat")
    check(flat)
    // 500 vectors / 2 → 250 cells → two-level (16 sub-cells per half)
    val imi = Similarity.buildVectorIndexAuto(emb, targetCellSize = 2)
    assert(imi.isInstanceOf[Similarity.TwoLevelVectorIndex],
      s"past the crossover auto must build two-level: $imi")
    check(imi)
  }

  test("IMI probe-side recall knob: nProbe=2 recovers the boundary pair flat catches and nProbe=1 misses") {
    // planted 2x2 product structure with a BOUNDARY pair: corpus vector
    // A = (1, .96 | 1, 0) sits in sub-cell 0 of half 1; its near-dup
    // probe B = (.96, 1 | 1, 0) (cos ≈ .9995) argmins just across the
    // boundary into sub-cell 1 — the exact recall loss the √cells
    // assignment trades (one near-dup pair split across product cells)
    val cent1 = Seq((0, Seq(1.0, 0.0), 1.0), (1, Seq(0.0, 1.0), 1.0))
      .toDF("cell", "cvec", "c2")
    val cent2 = Seq((0, Seq(1.0, 0.0), 1.0), (1, Seq(0.0, 1.0), 1.0))
      .toDF("cell", "cvec", "c2")
    val corpus = Seq(
      (1L, Seq(1.0, 0.96, 1.0, 0.0)),
      (2L, Seq(-1.0, -1.0, -1.0, -1.0)))  // unrelated, shares A's cell
      .toDF("vec_id", "embedding")
    val assigned = Similarity
      .appendToIvfIndexTwoLevel(corpus, cent1, cent2, k2 = 2).localCheckpoint()
    val batch = Seq((10L, Seq(0.96, 1.0, 1.0, 0.0))).toDF("vec_id", "embedding")
    def verdict(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("cell"), col("is_dup"), col("dup_of"), col("best_cos"))
      .as[(Long, Int, Boolean, Long, Double)].collect().head
    // the FLAT reference catches the pair (both argmin to one flat cell)
    val flatCent = Seq((0, Seq(1.0, 1.0, 1.0, 0.0), 3.0),
      (1, Seq(-1.0, -1.0, -1.0, -1.0), 4.0)).toDF("cell", "cvec", "c2")
    val flat = verdict(Similarity.semanticDedupAgainstIndex(
      batch, Similarity.appendToIvfIndex(corpus, flatCent), flatCent,
      threshold = 0.9))
    assert(flat._3 && flat._4 == 1L, s"flat must catch the boundary pair: $flat")
    // nProbe=1 IMI: B's home product cell (1·2+0 = 2) ≠ A's (0) — missed
    val p1 = verdict(Similarity.semanticDedupAgainstImiIndex(
      batch, assigned, cent1, cent2, k2 = 2, threshold = 0.9, nProbe = 1))
    assert(p1._2 == 2, s"home cell must be the build-rule cell: $p1")
    assert(!p1._3 && p1._4 == -1L && p1._5 == -1.0,
      s"nProbe=1 must miss the split pair (the documented trade): $p1")
    // nProbe=2: the per-half widened probe reaches A's product cell
    val p2 = verdict(Similarity.semanticDedupAgainstImiIndex(
      batch, assigned, cent1, cent2, k2 = 2, threshold = 0.9, nProbe = 2))
    assert(p2._3 && p2._4 == 1L && p2._5 >= 0.999,
      s"nProbe=2 must recover the boundary pair: $p2")
    assert(p2._2 == 2, s"the reported cell stays the home (append-rule) cell: $p2")
  }

  test("IMI+ADC composed index: useful recall vs brute force; day-2 append encodes bit-identically") {
    val emb = graft.Tables(spark, sfDir).embeddings
    val (corpus0, c1, c2, cb) = Similarity.buildImiPqIndex(emb)
    val corpus = corpus0.localCheckpoint()
    val out = Similarity.annImiPqSearch(corpus, c1, c2, k2 = 4, cb,
      k = 10, numQueries = 5, nProbe = 2)
      .as[(Long, Long, Long, Double)].collect()
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"q$q ranks gap")
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._4 >= p(1)._4),
        s"q$q cosines must be non-increasing")
    }
    val bf = Similarity.annBruteForce(spark, sfDir, k = 10, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val got = out.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val recalls = bf.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean recall $mean too low for the composed IMI+ADC path")
    // day-2 parity: re-encoding the whole corpus through the frozen
    // artifacts must reproduce the build's cells AND codes bit-exactly
    // (shared per-half argmin + shared flat-table code argmin)
    val appended = Similarity.appendToImiPqIndex(emb, c1, c2, k2 = 4, cb)
      .select(col("vec_id"), col("cell").as("a_cell"), col("codes").as("a_codes"))
    val diff = corpus.select(col("vec_id"), col("cell"), col("codes"))
      .join(appended, Seq("vec_id"))
      .filter(col("cell") =!= col("a_cell") ||
        col("codes") =!= col("a_codes"))
      .count()
    assert(diff == 0, s"$diff corpus rows re-encode differently through the day-2 path")
  }

  test("IMI ANN search: product-cell probing keeps useful recall vs brute force") {
    val emb = graft.Tables(spark, sfDir).embeddings
    val (assigned, c1, c2) = Similarity.buildIvfIndexTwoLevel(emb, k1 = 4, k2 = 4)
    val a = assigned.localCheckpoint()
    val out = Similarity.annImiSearch(a, c1, c2, k2 = 4, k = 10,
      numQueries = 5, nProbe = 2)
      .as[(Long, Long, Long, Double)].collect()
    // ranks are contiguous per query and cosines non-increasing
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"q$q ranks gap")
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._4 >= p(1)._4),
        s"q$q cosines must be non-increasing")
    }
    val bf = Similarity.annBruteForce(spark, sfDir, k = 10, numQueries = 5)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val got = out.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val recalls = bf.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean recall $mean too low for nProbe=2x2/16 product cells")
  }
  test("annRecall: exact basis points, missing queries report zero, probe widening is monotone") {
    import spark.implicits._
    val truth = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (2L, 6L))
      .toDF("q_id", "c_id")
    val approx = Seq((1L, 1L), (1L, 2L), (1L, 9L))
      .toDF("q_id", "c_id")
    val out = Similarity.annRecall(truth, approx, k = 3)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._3, r._4))).toMap
    assert(out(1L) == ((2L, 6666L)), s"2 of 3 = 6666 bp exactly: $out")
    assert(out(2L) == ((0L, 0L)), s"a query the tier missed entirely still reports: $out")
    intercept[IllegalArgumentException] { Similarity.annRecall(truth, approx, 0) }

    // q161 shape: widening the probe never loses a true neighbor (the
    // rerank is exact cosine, so candidate supersets dominate)
    val rep = Similarity.annRecallReport(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    val byQ = rep.groupBy(_._2).view.mapValues(_.map(r => r._1 -> r._5).toMap)
    byQ.foreach { case (q, m) =>
      assert(m("ivf_np4") >= m("ivf_np1"), s"monotone at q=$q: $m")
    }
    assert(rep.map(_._1).distinct.sorted.toSeq == Seq("ivf_np1", "ivf_np4"))
  }
  test("annPqRecallReport: widening the ADC cut is monotone, both tiers present") {
    import spark.implicits._
    val rep = Similarity.annPqRecallReport(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rep.map(_._1).distinct.sorted.toSeq == Seq("pq_r10", "pq_r50"))
    val byQ = rep.groupBy(_._2).view.mapValues(_.map(r => r._1 -> r._5).toMap)
    byQ.foreach { case (q, m) =>
      assert(m("pq_r50") >= m("pq_r10"), s"monotone at q=$q: $m")
    }
  }
  test("rebalanceIvfIndex: fat cells split locally, the rest untouched, the dedup guard's remedy works") {
    import spark.implicits._
    // planted: two tight 10-vector blobs + one FAT cell of 60 vectors
    // that itself carries 4 sub-blobs of 15 — splittable substructure
    def blob(center: Seq[Double], n: Int, base: Long): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        (base + i, center.zipWithIndex.map { case (c, d) =>
          (c + 0.01 * ((i * 7 + d * 3) % 5)).toFloat })
      }
    val dim = 8
    def c(hot: Int*): Seq[Double] =
      (0 until dim).map(d => if (hot.contains(d)) 10.0 else 0.0)
    val vecs = blob(c(0), 10, 0L) ++ blob(c(1), 10, 100L) ++
      (0 until 4).flatMap(s => blob(c(2, 3 + s), 15, 200L + s * 15))
    val emb = vecs.toDF("vec_id", "embedding")
      .withColumn("label", lit(0L))
    val (assigned0, cents0) = Similarity.buildIvfIndex(emb, nClusters = 3)
    val assigned = assigned0.localCheckpoint()
    val cents = cents0.localCheckpoint()
    val census0 = assigned.groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(census0.values.max == 60L, s"the plant must make one fat cell: $census0")
    // the oversized-cell guard trips BEFORE the heal...
    intercept[Exception] {
      Similarity.semanticDedupAssigned(assigned, maxCellSize = 20).collect()
    }
    val (a1, c1, did) = Similarity.rebalanceIvfIndex(assigned, cents,
      maxCellSize = 20L, targetCellSize = 15)
    assert(did, "a fat cell must trigger the rewrite")
    val a1ck = a1.localCheckpoint(); val c1ck = c1.localCheckpoint()
    val census1 = a1ck.groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(census1.values.max <= 20L, s"no cell may stay fat: $census1")
    assert(a1ck.count() == 80L &&
      a1ck.select("vec_id").distinct().count() == 80L, "every row preserved once")
    // untouched cells keep their rows AND their centroid bytes
    val smallCells = census0.filter(_._2 == 10L).keys.toSet
    smallCells.foreach { cc =>
      val before = assigned.filter(col("cell") === cc)
        .select("vec_id").as[Long].collect().sorted.toSeq
      val after = a1ck.filter(col("cell") === cc)
        .select("vec_id").as[Long].collect().sorted.toSeq
      assert(before == after, s"cell $cc must be untouched")
    }
    assert(c1ck.count() > cents.count(), "sub-centroids append under fresh ids")
    assert(c1ck.select("cell").distinct().count() == c1ck.count(),
      "centroid ids stay unique")
    // ...and no longer trips AFTER it — the guard's named remedy
    val dedup = Similarity.semanticDedupAssigned(a1ck, maxCellSize = 20)
    assert(dedup.count() == 80L, "the dedup pass runs clean post-rebalance")
    // a fat-blob member still finds its sub-blob twin through the
    // rebalanced index (search semantics survive the split)
    val hit = Similarity.annIvfSearch(a1ck, c1ck, k = 1, numQueries = 1, nProbe = 2)
      .select("c_id").as[Long].collect()
    assert(hit.nonEmpty, "search still answers through the rebalanced artifact")
    // healthy index: the next scheduled tick no-ops
    val (_, _, again) = Similarity.rebalanceIvfIndex(a1ck, c1ck,
      maxCellSize = 20L, targetCellSize = 15)
    assert(!again, "a balanced index must no-op")
    intercept[IllegalArgumentException] {
      Similarity.rebalanceIvfIndex(a1ck, c1ck, maxCellSize = 10L, targetCellSize = 15)
    }
    // an empty centroid table refuses loudly instead of NPE-ing on the
    // max-cell read (r15 advice fix)
    val emptyCents = cents.filter(lit(false))
    val ex = intercept[IllegalArgumentException] {
      Similarity.rebalanceIvfIndex(assigned, emptyCents,
        maxCellSize = 20L, targetCellSize = 15)
    }
    assert(ex.getMessage.contains("empty"), s"got: ${ex.getMessage}")
  }

  test("JL projection: norms preserved in expectation, search through it keeps useful recall, loud guards") {
    import spark.implicits._
    val p = Similarity.projectVectors(Tables(spark, sfDir).embeddings)
    // E[|p|²] = |v|² for the ±1/√k family — per-vector ratios
    // concentrate around 1 within the JL distortion band, and the
    // corpus mean sits tight
    val ratios = p.select(
        (graft.functions.vectors.dot(col("pvec"), col("pvec")) /
          (col("nrm") * col("nrm"))).as("r"))
      .as[Double].collect()
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean drifted from 1")
    assert(ratios.forall(r => r > 0.2 && r < 3.0),
      s"a per-vector ratio left the JL band: ${ratios.min} .. ${ratios.max}")
    // search through the projection: candidates from 16-dim scores,
    // exact rerank — recall floor vs brute force, the LSH convention
    val bf = Similarity.annBruteForce(spark, sfDir)
      .select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val got = Similarity.annJlSearch(spark, sfDir)
      .select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = bf.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    assert(recalls.sum / recalls.size >= 0.4,
      s"mean recall ${recalls.sum / recalls.size} too low for a 4x-narrower scan + rerank 50")
    // non-power-of-four outDim would make 1/√outDim inexact — refused
    intercept[IllegalArgumentException] {
      Similarity.projectVectors(Tables(spark, sfDir).embeddings, outDim = 8)
    }
  }
  test("annLshRecallReport: widening the band split is monotone (nested band boundaries)") {
    import spark.implicits._
    // bands of 8 bits are pairs of adjacent 4-bit bands, so every
    // 2-band collision is also a 4-band collision — candidate superset,
    // exact rerank ⇒ dominance
    val rep = Similarity.annLshRecallReport(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rep.map(_._1).distinct.sorted.toSeq == Seq("lsh_b2", "lsh_b4"))
    val byQ = rep.groupBy(_._2).view.mapValues(_.map(r => r._1 -> r._5).toMap)
    byQ.foreach { case (q, m) =>
      assert(m("lsh_b4") >= m("lsh_b2"), s"monotone at q=$q: $m")
    }
    assert(rep.length == 10, s"5 queries x 2 tiers: ${rep.length}")
  }
  test("annPqCodebookRecallReport: both codebook tiers report every query point") {
    import spark.implicits._
    // NO monotonicity claim here — a bigger codebook changes the ADC
    // geometry rather than widening a candidate superset, so per-query
    // recall may move either way; the meter's job is to MEASURE it
    val rep = Similarity.annPqCodebookRecallReport(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rep.map(_._1).distinct.sorted.toSeq == Seq("pq_cb16", "pq_cb64"))
    assert(rep.length == 10, s"5 queries x 2 tiers: ${rep.length}")
    assert(rep.forall(r => r._5 >= 0 && r._5 <= 10000), "recall_bp in range")
  }
  test("annImiRecallReport: per-half probe widening is monotone on the two-level tier") {
    import spark.implicits._
    // q163 shape: nProbe=2's 4 probed product cells are a superset of
    // nProbe=1's single cell (per-half top-1 is always inside per-half
    // top-2) and the rerank is exact cosine — superset dominance again
    val rep = Similarity.annImiRecallReport(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rep.map(_._1).distinct.sorted.toSeq == Seq("imi_np1", "imi_np2"))
    val byQ = rep.groupBy(_._2).view.mapValues(_.map(r => r._1 -> r._5).toMap)
    byQ.foreach { case (q, m) =>
      assert(m("imi_np2") >= m("imi_np1"), s"monotone at q=$q: $m")
    }
    // the twin really runs the production search: every query point
    // reports at both widths (5 queries x 2 tiers)
    assert(rep.length == 10, s"expected 10 meter rows, got ${rep.length}")
  }
  test("annImiPqRecallReport: widening the ADC cut is monotone on the composed tier") {
    import spark.implicits._
    val rep = Similarity.annImiPqRecallReport(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rep.map(_._1).distinct.sorted.toSeq == Seq("imipq_r10", "imipq_r50"))
    val byQ = rep.groupBy(_._2).view.mapValues(_.map(r => r._1 -> r._5).toMap)
    byQ.foreach { case (q, m) =>
      assert(m("imipq_r50") >= m("imipq_r10"), s"monotone at q=$q: $m")
    }
    assert(rep.length == 10, s"expected 10 meter rows, got ${rep.length}")
  }
}

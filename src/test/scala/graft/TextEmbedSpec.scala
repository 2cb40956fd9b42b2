package graft

import graft.operators.{Similarity, TextEmbed}
import org.apache.spark.sql.functions._

class TextEmbedSpec extends SparkSpecBase {
  import spark.implicits._

  test("fused embed kernel equals the per-token Column formulation on real documents") {
    val docs = Tables(spark, sfDir).documents
    val dims = 32
    val fused = TextEmbed.embedDocuments(docs, dims)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Double])].collect().toMap
    // independent formulation: explode tokens, md5-derive the 60-bit
    // hash as a Column, sum signs per (doc, dim)
    val viaColumns = docs
      .select(col("doc_id").cast("long").as("vec_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
      .select(col("vec_id"), col("h"),
        explode(array((0 until dims).map(lit): _*)).as("j"))
      .withColumn("s", when(expr("shiftright(h, j)").bitwiseAND(1) === 1, 1)
        .otherwise(-1))
      .groupBy(col("vec_id"), col("j")).agg(sum(col("s")).as("c"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("j"), col("c")))).as("p"))
      .select(col("vec_id"),
        expr("transform(p, x -> cast(x.c as double))").as("embedding"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(fused.keySet == viaColumns.keySet)
    fused.foreach { case (id, v) =>
      assert(v == viaColumns(id), s"doc $id: $v vs ${viaColumns(id)}")
    }
  }

  test("planted truth: exact and near-dup texts verdict as dups, unrelated do not") {
    // 20 unrelated docs (ids 0-19, each a distinct token universe) act
    // as centroid donors and distractors; 100/101 are copies of doc 3's
    // text (one with a single appended token), 102 is fresh
    val base = (0 until 20).map(i =>
      (i.toLong, (1 to 12).map(k => s"tok${i}_$k").mkString(" ")))
    val docs = (base ++ Seq(
      (100L, base(3)._2),
      (101L, base(3)._2 + " extra"),
      (102L, (1 to 12).map(k => s"fresh_$k").mkString(" ")))).toDF("doc_id", "text")
    val emb = TextEmbed.embedDocuments(docs)
    val out = Similarity.semanticDedup(emb, Similarity.formulaCentroids(emb), 0.92)
      .select(col("vec_id"), col("is_dup"), col("dup_of"))
      .as[(Long, Boolean, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(100L) == ((true, Some(3L))), s"exact copy must dup onto 3: ${out(100L)}")
    assert(out(101L)._1, s"near copy must verdict as dup: ${out(101L)}")
    assert(!out(102L)._1, "fresh doc must survive")
    assert(base.forall(b => !out(b._1)._1), "unrelated originals keep themselves")
  }

  test("trained-quantizer path (q134): planted near-dups verdict as dups across KMeans cells, originals survive") {
    // 40 distinct "topic" docs (disjoint token universes → mutually
    // near-orthogonal embeddings) force a multi-cell KMeans fit at
    // targetCellSize=8; copies/near-copies of topics 3 and 17 must land
    // in their original's cell (identical embeddings) and verdict as
    // dups of it, everything else must survive. This certifies the
    // TRAINED path end-to-end — embed → auto-sized KMeans quantizer →
    // assigned-frame SemDeDup — where q85/q95 pin formula centroids.
    val base = (0 until 40).map(i =>
      (i.toLong, (1 to 12).map(k => s"topic${i}_w$k").mkString(" ")))
    val docs = (base ++ Seq(
      (200L, base(3)._2),                    // exact copy of topic 3
      (201L, base(3)._2 + " stray"),         // near copy of topic 3
      (202L, base(17)._2),                   // exact copy of topic 17
      (203L, (1 to 12).map(k => s"fresh_w$k").mkString(" ")))) // novel
      .toDF("doc_id", "text")
    val out = TextEmbed.textSemDedupTrainedFrame(docs, targetCellSize = 8)
      .select(col("vec_id"), col("cell"), col("is_dup"), col("dup_of"))
      .as[(Long, Int, Boolean, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // the quantizer really trained multi-cell (not one degenerate cell)
    assert(out.values.map(_._1).toSet.size >= 4,
      s"auto-sized KMeans must spread 44 docs over >=4 cells, got ${out.values.map(_._1).toSet}")
    assert(out(200L)._2 && out(200L)._3 == Some(3L),
      s"exact copy must dup onto 3: ${out(200L)}")
    assert(out(201L)._2, s"near copy must verdict as dup: ${out(201L)}")
    assert(out(202L)._2 && out(202L)._3 == Some(17L),
      s"exact copy must dup onto 17: ${out(202L)}")
    assert(!out(203L)._2, "novel doc must survive")
    assert(base.forall(b => !out(b._1)._2),
      "originals keep themselves (keep-lowest-id)")
    // exact copies share their original's trained cell — identical
    // embeddings cannot split across cells under any argmin rule
    assert(out(200L)._1 == out(3L)._1 && out(202L)._1 == out(17L)._1)
  }

  test("two-level (IMI) trained path (q138): verdicts match the flat path on planted topics") {
    // same planted corpus as the q134 spec: the product-cell quantizer
    // must reach the SAME dup verdicts (identical embeddings share both
    // sub-cells, so twins can never split across product cells) even
    // though the cell ids themselves differ from the flat path's
    val base = (0 until 40).map(i =>
      (i.toLong, (1 to 12).map(k => s"topic${i}_w$k").mkString(" ")))
    val docs = (base ++ Seq(
      (200L, base(3)._2),
      (201L, base(3)._2 + " stray"),
      (202L, base(17)._2),
      (203L, (1 to 12).map(k => s"fresh_w$k").mkString(" "))))
      .toDF("doc_id", "text")
    def verdicts(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("is_dup"), col("dup_of"))
      .as[(Long, Boolean, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val imi = verdicts(TextEmbed.textSemDedupImiFrame(docs, targetCellSize = 8))
    val flat = verdicts(TextEmbed.textSemDedupTrainedFrame(docs, targetCellSize = 8))
    assert(imi == flat,
      s"IMI and flat verdicts must agree on clustered data: ${imi.toSeq.diff(flat.toSeq)}")
    assert(imi(200L) == ((true, Some(3L))) && imi(202L) == ((true, Some(17L))))
    assert(!imi(203L)._1 && base.forall(b => !imi(b._1)._1))
  }

  test("quantizer auto-switch (round 14): pure rule + both sides of the crossover") {
    // the pure decision (no build): flat through the measured crossover,
    // two-level past it, forced values obeyed, junk refused loudly
    assert(!TextEmbed.useTwoLevel(4L, "auto"))
    assert(!TextEmbed.useTwoLevel(TextEmbed.FlatCellsCrossover, "auto"))
    assert(TextEmbed.useTwoLevel(TextEmbed.FlatCellsCrossover + 1, "auto"))
    assert(!TextEmbed.useTwoLevel(100000L, "flat"))
    assert(TextEmbed.useTwoLevel(4L, "imi"))
    intercept[IllegalArgumentException] { TextEmbed.useTwoLevel(4L, "bogus") }

    // integration, below the crossover (44 docs / tcs=8 → 6 cells):
    // auto must BE the flat build — same seed, same pipeline, so the
    // full (vec_id, cell, verdict) frame is bit-identical
    val base = (0 until 40).map(i =>
      (i.toLong, (1 to 12).map(k => s"topic${i}_w$k").mkString(" ")))
    val docs = (base ++ Seq(
      (200L, base(3)._2), (201L, base(3)._2 + " stray"),
      (202L, base(17)._2),
      (203L, (1 to 12).map(k => s"fresh_w$k").mkString(" "))))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("cell"), col("is_dup"), col("dup_of"))
      .as[(Long, Int, Boolean, Option[Long])].collect().toSet
    assert(rows(TextEmbed.textSemDedupTrainedFrame(docs, targetCellSize = 8)) ==
      rows(TextEmbed.textSemDedupTrainedFrame(docs, targetCellSize = 8, quantizer = "flat")),
      "below the crossover, auto must take the flat build bit-exactly")

    // integration, above the crossover (304 docs / tcs=2 → 152 cells):
    // auto must BE the two-level build — product-cell ids and verdicts
    // identical to the forced-imi run
    val wide = (0 until 300).map(i =>
      (i.toLong, (1 to 12).map(k => s"topic${i}_w$k").mkString(" ")))
    val wideDocs = (wide ++ Seq(
      (400L, wide(3)._2), (401L, wide(17)._2),
      (402L, (1 to 12).map(k => s"fresh_w$k").mkString(" "))))
      .toDF("doc_id", "text")
    val auto = rows(TextEmbed.textSemDedupTrainedFrame(wideDocs, targetCellSize = 2))
    assert(auto ==
      rows(TextEmbed.textSemDedupImiFrame(wideDocs, targetCellSize = 2)),
      "above the crossover, auto must take the two-level build bit-exactly")
    val m = auto.map(r => r._1 -> ((r._3, r._4))).toMap
    assert(m(400L) == ((true, Some(3L))) && m(401L) == ((true, Some(17L))),
      s"twins must still dup onto their donors across the switch: ${m(400L)}, ${m(401L)}")
    assert(!m(402L)._1, "the novel doc must survive above the crossover")
  }

  test("embedding cosine tracks token overlap (JL contract)") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),         // identical → cos 1
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8")  // disjoint → cos ≈ 0
    ).toDF("doc_id", "text")
    val e = TextEmbed.embedDocuments(docs)
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(math.abs(cos(e(1L), e(2L)) - 1.0) < 1e-12)
    assert(math.abs(cos(e(1L), e(3L))) < 0.6,
      s"disjoint docs must not look similar: ${cos(e(1L), e(3L))}")
  }

  test("dims outside [2, 60] refuse loudly — through the library AND the raw SQL function") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { TextEmbed.embedDocuments(docs, 1) }
    intercept[IllegalArgumentException] { TextEmbed.embedDocuments(docs, 61) }
    // the public SQL function must enforce the same bound: dims 61-64
    // would silently yield constant components (md5 carries 60 bits)
    // and >= 65 would repeat low components via the mod-64 shift
    val e = intercept[Exception] {
      spark.sql("SELECT graft_text_embed(array('a','b'), 64)").collect()
    }
    def msg(t: Throwable) = Option(t.getMessage).getOrElse("") +
      Option(t.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg(e).contains("[2, 60]"), s"wrong error: ${msg(e)}")
  }

  test("JL contract at dims=60 on sf0.1 data: full-width cosine tracks true bag-of-tokens cosine (round 12)") {
    // the q95 registered width, measured on REAL data at 10× the spec
    // corpus: for sampled doc pairs, |cos_emb − cos_true| stays inside
    // the JL envelope, and dims=60 approximates strictly tighter than a
    // narrow dims=8 projection on average
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 120)
    def bag(text: String): Map[String, Int] =
      text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, xs) => t -> xs.length }
    val texts = docs.as[(Long, String)].collect().toMap
    def trueCos(a: Long, b: Long): Double = {
      val (u, v) = (bag(texts(a)), bag(texts(b)))
      val dot = u.keysIterator.map(t => u(t).toDouble * v.getOrElse(t, 0)).sum
      dot / (math.sqrt(u.values.map(x => x.toDouble * x).sum) *
        math.sqrt(v.values.map(x => x.toDouble * x).sum))
    }
    def embCos(dims: Int): Map[Long, Seq[Double]] =
      TextEmbed.embedDocuments(docs, dims).as[(Long, Seq[Double])].collect().toMap
    val (e60, e8) = (embCos(60), embCos(8))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val ids = texts.keys.toSeq.sorted
    val pairs = ids.zip(ids.tail) ++ ids.grouped(2).collect { case Seq(a, b) => (a, b) }
    val errs = pairs.map { case (a, b) =>
      val t = trueCos(a, b)
      (math.abs(cos(e60(a), e60(b)) - t), math.abs(cos(e8(a), e8(b)) - t))
    }
    val (m60, m8) = (errs.map(_._1).sum / errs.size, errs.map(_._2).sum / errs.size)
    assert(errs.map(_._1).max < 0.52,
      s"dims=60 must stay inside ~4σ of the true cosine, worst=${errs.map(_._1).max}")
    assert(m60 < m8,
      s"dims=60 must approximate tighter than dims=8 on average: $m60 vs $m8")
    assert(m60 < 0.15, s"dims=60 mean JL error too large: $m60")
  }
}

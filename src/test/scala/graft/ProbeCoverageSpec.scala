package graft

import org.apache.spark.sql.functions._

/** Round-12 hardening, made a permanent gate: every registered DAY-2
  * probe query must exercise BOTH of its verdict paths on the synthetic
  * corpus. The failure class this catches is invisible to the oracle
  * gate — round 12 found two round-11 probes (q111, q117) whose planted
  * state never crossed their corpus/batch split (the synthetic corpus
  * fixes `doc_id % 5` per source and per recrawl group), so the strip
  * stripped nothing and the URL probe hit nothing while the DuckDB
  * oracle replayed the identical no-op and every hash stayed green.
  * An oracle certifies that both engines compute the same answer; only
  * a coverage check certifies the answer exercises the operator. */
class ProbeCoverageSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("verdict probes emit both dup and clean rows") {
    Seq("q71_neardup_verdicts", "q98_semantic_dedup_probe",
        "q107_exact_probe", "q111_url_probe").foreach { q =>
      val flags = run(q).select(col("is_dup")).as[Boolean].collect()
      assert(flags.contains(true), s"$q: the dup verdict never fires — latent no-op")
      assert(flags.contains(false), s"$q: the clean verdict never fires")
    }
  }

  test("census probes genuinely remove and genuinely keep") {
    // (query, removal column, retention column) — removal must fire
    // somewhere, retention must fire somewhere, or the probe is either
    // a no-op or a text shredder
    val cases = Seq(
      ("q75_span_census_probe", "n_removed", "n_tokens"),
      ("q76_paragraph_census_probe", "n_dropped", "n_kept"),
      ("q117_boilerplate_probe", "n_removed", "n_lines"))
    cases.foreach { case (q, removed, kept) =>
      val df = run(q).select(col(removed).cast("long"), col(kept).cast("long"))
        .as[(Long, Long)].collect()
      assert(df.exists(_._1 > 0), s"$q: $removed never positive — latent no-op")
      assert(df.exists { case (r, k) => k > r },
        s"$q: nothing survives removal anywhere — shredder, not a probe")
    }
  }

  test("round-13 gate: EVERY registered query's boolean columns fire both verdict paths") {
    // The q111/q117 lesson generalized beyond the probe list: any
    // registered query emitting a BooleanType column is asserting a
    // verdict, and a verdict that only ever fires one way on the
    // synthetic corpus is indistinguishable from a no-op to the oracle
    // gate (both engines agree on the no-op). Sweep the WHOLE registry:
    // plan every query, execute the ones that carry booleans, and
    // require both values present — one-sided columns must be
    // allowlisted HERE with their reason, so a silent no-op can never
    // ride in under a green hash again.
    val allowed: Map[(String, String), String] = Map(
      // Planted-coefficient CERTIFICATION queries: recovered_ok
      // all-true IS the assertion (the oracle hash-checks the exact
      // booleans) — a false would mean solver drift and must fail the
      // round, so demanding a false here would demand a broken solver.
      ("q82_forecast_planted", "recovered_ok") ->
        "planted-recovery certification: all-true is the contract",
      ("q83_forecast_planted_mult", "recovered_ok") ->
        "planted-recovery certification: all-true is the contract",
      // The NB classifier verdicts all-true because the synthetic
      // corpus's language markers are separable by construction —
      // 100% holdout accuracy is the genuinely COMPUTED answer, not a
      // copied label (ClassifySpec's planted-mislabel case certifies
      // the false path fires when the label and the text disagree).
      ("q108_nb_classifier", "correct") ->
        "separable synthetic corpus; false path certified in ClassifySpec",
      ("q112_nb_incremental", "correct") ->
        "separable synthetic corpus; false path certified in ClassifySpec")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var swept = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val boolCols = df.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.BooleanType)
        .map(_.name).toSeq
      if (boolCols.nonEmpty) {
        swept += 1
        val aggs = boolCols.flatMap(c => Seq(
          sum(when(col(c) === true, 1L).otherwise(0L)).as(s"${c}__t"),
          sum(when(col(c) === false, 1L).otherwise(0L)).as(s"${c}__f")))
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        boolCols.zipWithIndex.foreach { case (c, i) =>
          val t = Option(row.get(2 * i)).exists(_.asInstanceOf[Long] > 0L)
          val f = Option(row.get(2 * i + 1)).exists(_.asInstanceOf[Long] > 0L)
          if (!(t && f) && !allowed.contains((name, c)))
            failures += s"$name.$c fires only ${if (t) "TRUE" else if (f) "FALSE" else "NEITHER (empty/null)"}"
        }
      }
    }
    assert(swept >= 10, s"the sweep found only $swept boolean-carrying queries — registry scan broken?")
    assert(failures.isEmpty,
      s"one-sided verdict columns (latent no-ops unless allowlisted):\n  ${failures.mkString("\n  ")}")
  }

  test("the day-2 audit pipelines fire every planted door") {
    val q132 = run("q132_curation_probe")
      .select(col("n_text_dups"), col("n_kept")).as[(Long, Long)].collect()
    assert(q132.map(_._1).sum > 0, "q132: the exact probe never hits")
    assert(q132.map(_._2).sum > 0, "q132: nothing survives the pipeline")
  }
}

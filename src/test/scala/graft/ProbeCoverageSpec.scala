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

  test("the day-2 audit pipelines fire every planted door") {
    val q132 = run("q132_curation_probe")
      .select(col("n_text_dups"), col("n_kept")).as[(Long, Long)].collect()
    assert(q132.map(_._1).sum > 0, "q132: the exact probe never hits")
    assert(q132.map(_._2).sum > 0, "q132: nothing survives the pipeline")
  }
}

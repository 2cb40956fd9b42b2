package graft

import graft.functions.{text => T}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("stripAccents folds Latin accents") {
    val out = Seq("Ñandú café PIÑATA").toDF("s")
      .select(T.stripAccents(col("s"))).as[String].head()
    assert(out == "Nandu cafe PINATA")
  }

  test("cleanName mirrors dataframe_clean_cols semantics") {
    // Google_Bigquery.py:57 — lower, space→_, ga: strip, &→_, ñ→n
    val out = Seq("ga:Sesión & Páginas  Vistas").toDF("s")
      .select(T.cleanName(col("s"))).as[String].head()
    assert(out == "sesion_paginas_vistas")
  }

  test("cleanColumnNames renames every column") {
    val df = Seq((1, 2)).toDF("ga:User Count", "Página&Vista")
    assert(T.cleanColumnNames(df).columns.toSeq == Seq("user_count", "pagina_vista"))
  }

  test("fingerprint is whitespace/case invariant") {
    val df = Seq(("a", "Hello  World "), ("b", "hello world")).toDF("id", "t")
      .select(T.fingerprint(col("t")).as("fp"))
    assert(df.distinct().count() == 1)
  }

  test("packed language scores equal the per-language filters on real docs") {
    import org.apache.spark.sql.functions.col
    import graft.functions.{text => T}
    // the single-pass packed fold must reproduce the 5 independent
    // filter counts exactly — including shared tokens ("la" ∈ es+fr)
    val docs = Tables(spark, sfDir).documents.limit(200)
      .select(col("doc_id"), col("text"))
    val slow = docs.select(col("doc_id") +: T.langIdScores(col("text")).map {
      case (l, c) => c.as(s"s_$l") }: _*)
    val fast = docs.select(col("doc_id"), T.langScoresPacked(col("text")).as("p"))
      .select(col("doc_id") +: T.stopwords.indices.map(i =>
        T.unpackLangScore(col("p"), i).as(s"s_${T.stopwords(i)._1}")): _*)
    assert(fast.except(slow).count() == 0 && slow.except(fast).count() == 0)
  }

  test("stopwordHits counts with repetition") {
    val n = Seq("the cat and the dog").toDF("t")
      .select(T.stopwordHits(T.tokens(col("t")), Seq("the", "and"))).as[Long].head()
    assert(n == 3L)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text / schema-name cleaning and text-analysis column functions.
  *
  * Mirrors the reference's cleaning semantics
  * (Google_Bigquery.py:57 `dataframe_clean_cols`: lower, space→_, "ga:"
  * prefix strip, &→_, ___→_, ñ→n; utils accent stripping via unidecode)
  * as pure, codegen-friendly column expressions — no UDFs.
  */
object text {

  // Accent fold table (common Latin-1 accents, the unidecode subset the
  // reference actually exercises). Built from pairs so src/dst stay aligned.
  private val accentPairs: Seq[(String, Char)] = Seq(
    ("áàâãäå", 'a'), ("ÁÀÂÃÄÅ", 'A'),
    ("éèêë", 'e'), ("ÉÈÊË", 'E'),
    ("íìîï", 'i'), ("ÍÌÎÏ", 'I'),
    ("óòôõö", 'o'), ("ÓÒÔÕÖ", 'O'),
    ("úùûü", 'u'), ("ÚÙÛÜ", 'U'),
    ("ýÿ", 'y'), ("Ý", 'Y'),
    ("ç", 'c'), ("Ç", 'C'),
    ("ñ", 'n'), ("Ñ", 'N')
  )
  private val accentSrc: String = accentPairs.map(_._1).mkString
  private val accentDst: String = accentPairs.flatMap { case (s, d) => s.map(_ => d) }.mkString
  require(accentSrc.length == accentDst.length)

  /** Strip Latin accents (á→a, ñ→n, …). Equivalent of DuckDB strip_accents
    * for the Latin-1 range; a native `translate` — fully codegen'd. */
  def stripAccents(c: Column): Column = translate(c, accentSrc, accentDst)

  /** Scala-side twin for renaming schema columns. */
  def stripAccentsStr(s: String): String =
    s.map { ch => val i = accentSrc.indexOf(ch); if (i >= 0) accentDst(i) else ch }

  /** Column-value cleaner: lower, accent-strip, "ga:" prefix strip, any
    * non-alnum run → "_", trim outer "_". (Google_Bigquery.py:57.) */
  def cleanName(c: Column): Column =
    trim(regexp_replace(regexp_replace(stripAccents(lower(trim(c))), "^ga:", ""), "[^a-z0-9]+", "_"), "_")

  /** String twin of [[cleanName]] for renaming DataFrame columns. */
  def cleanNameStr(s: String): String =
    stripAccentsStr(s.trim.toLowerCase)
      .replaceAll("^ga:", "")
      .replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")

  /** Rename every column of `df` with [[cleanNameStr]] — the DataFrame
    * equivalent of `dataframe_clean_cols`. Pure metadata op, no job. */
  def cleanColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.toSeq.map(cleanNameStr): _*)

  /** Whitespace tokens of trimmed, lowercased text. Trim first so Spark and
    * DuckDB agree on leading/trailing empty tokens. */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  // ---- language ID (C8): stopword-overlap heuristic -------------------

  /** Tiny function-word lists per language. Deterministic, public-knowledge
    * stopword sets — the classic n-gram/stopword language-ID heuristic. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "por", "con", "no", "se"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "que", "pour", "dans", "est", "du", "pas", "au"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von", "nicht", "den", "im", "auf"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "人", "有", "他", "这", "中", "大", "来", "上")
  )

  /** Count of tokens present in `words` (with repetition). */
  def stopwordHits(toks: Column, words: Seq[String]): Column = {
    val lst = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(lst, t))).cast("long")
  }

  /** Predicted language: argmax of per-language stopword hits with a fixed
    * preference order (en > es > fr > de > zh) for deterministic ties. */
  def langIdScores(c: Column): Seq[(String, Column)] = {
    val t = tokens(c)
    stopwords.map { case (lang, words) => lang -> stopwordHits(t, words) }
  }

  /** All five language scores packed into ONE token pass: each token
    * looks up a 60-bit mask (12 bits per language; a token in several
    * lists, e.g. "la" in es+fr, carries several fields) in a map
    * literal, and the masks SUM over the document. The per-language
    * counts are identical to [[langIdScores]] (occurrences counted, same
    * sets) but the array is traversed once instead of once per language
    * — the q27 plan drops from five split+filter evaluations per row to
    * one. Exact while every per-language count stays < 4096 per
    * document (a 12-bit field; real documents are far below it).
    *
    * Returns the packed column; unpack per language with
    * [[unpackLangScore]] over an ATTRIBUTE holding it (materialize via
    * withColumn first — re-deriving five columns from this expression
    * directly would re-evaluate the fold five times). */
  def langScoresPacked(c: Column): Column = langScoresPackedToks(tokens(c))

  /** [[langScoresPacked]] over an already-materialized tokens attribute
    * (callers that also need the tokens — e.g. the overflow gate below —
    * build the array once). */
  def langScoresPackedToks(toks: Column): Column = {
    val tokenMask: Map[String, Long] = stopwords.zipWithIndex.flatMap {
      case ((_, ws), i) => ws.map(w => w -> (1L << (12 * i)))
    }.groupMapReduce(_._1)(_._2)(_ | _)
    val mm = map(tokenMask.toSeq.sortBy(_._1).flatMap {
      case (w, m) => Seq(lit(w), lit(m))
    }: _*)
    aggregate(
      transform(toks, tok => coalesce(element_at(mm, tok), lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }

  /** Extract language `i` (index into [[stopwords]]) from a packed
    * score column. */
  def unpackLangScore(packed: Column, i: Int): Column =
    shiftright(packed, 12 * i).bitwiseAND(lit(0xFFFL))

  /** Per-language scores that are EXACT at any document length: unpack
    * the packed fold while every field is provably in range (per-language
    * hits are bounded by the token count, so `size(toks) < 4096` ⟹ no
    * 12-bit field can overflow into its neighbor), and fall back to the
    * five-pass exact count for longer documents. Long documents are rare
    * in a filtered corpus, so the fallback's extra traversals price only
    * the tail; a 12k-token page of English prose (>4096 hits of "the"
    * alone is routine at pretraining scale) silently flipped predictions
    * under the unconditional packed path.
    *
    * Both arguments must be ATTRIBUTES (materialize via select/withColumn
    * first): the `when` keeps the fallback lazy per row, but a non-
    * attribute `toks` expression tree would re-evaluate per language. */
  def langScoresGated(toksAttr: Column, packedAttr: Column): Seq[(String, Column)] =
    stopwords.zipWithIndex.map { case ((lang, words), i) =>
      lang -> when(size(toksAttr) < 4096, unpackLangScore(packedAttr, i))
        .otherwise(stopwordHits(toksAttr, words))
    }

  // ---- fingerprinting (C11) -------------------------------------------

  /** Whitespace-collapsed, lowercased, trimmed normal form. */
  def normalizeText(c: Column): Column = regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Content fingerprint: md5 over the normal form (C11 / q30). */
  def fingerprint(c: Column): Column = md5(normalizeText(c))
}

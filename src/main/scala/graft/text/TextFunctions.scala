package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the LLM-pipeline surface
  * (SURVEY §2.C): tokenization, shingling, quality scoring, language
  * ID, token counting, fingerprinting. All pure `functions._`
  * compositions (codegen'd, no UDFs), so they inline into whole-stage
  * codegen and scale with the scan.
  *
  * Where an operator is oracle-checked, the companion `*Sql` method
  * emits the DuckDB expression with identical semantics.
  */
object TextFunctions {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")
  def tokensSql(text: String): String = s"string_split_regex(lower(trim($text)), '\\s+')"

  /** word n-gram shingles (space-joined), empty array when fewer than n
    * tokens. Fused custom expression: the equivalent HOF formulation
    * re-evaluates the tokenizer split inside the transform lambda
    * (quadratic per row — measured 12s over 5k docs vs sub-second
    * fused). Output matches [[shinglesSql]] exactly.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.GraftExpressions.word_shingles(text, n)
  def shinglesSql(text: String, n: Int): String = {
    val t = tokensSql(text)
    val parts = (0 until n).map(j => s"t[CAST(i + $j AS BIGINT)]").mkString(" || ' ' || ")
    s"(SELECT CASE WHEN len(t) >= $n THEN list_transform(range(1, len(t) - ${n - 2}), i -> $parts) ELSE [] END FROM (SELECT $t AS t))"
  }

  def tokenCount(text: Column): Column = size(tokens(text))
  def tokenCountSql(text: String): String = s"len(${tokensSql(text)})"

  // ---- variants over a pre-materialized token array --------------------
  // Project `tokens(text)` ONCE (its own select — CollapseProject keeps
  // a non-cheap alias referenced more than once in its own projection)
  // and derive the stats from the array: whole-stage codegen does not
  // reliably CSE repeated tokenizations across expression trees, and
  // the regex split is the expensive part. Semantics are identical to
  // the text-input forms (same oracle SQL applies).

  def tokenCountOf(toks: Column): Column = size(toks)

  def meanTokenLenOf(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(toks)

  def stopwordRatioOf(toks: Column, stopwords: Seq[String] = defaultStopwords): Column =
    size(filter(toks, x => x.isInCollection(stopwords))).cast("double") / size(toks)

  def langIdOf(toks: Column): Column = {
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, x => x.isInCollection(markers)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language reaching the max score wins; und when max == 0
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
  }

  def qualityScoreOf(text: Column, toks: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio(text) * lit(4.0), lit(0.0))
    val stopScore = least(stopwordRatioOf(toks) * lit(5.0), lit(1.0))
    (lenScore * lit(0.4) + punctScore * lit(0.4) + stopScore * lit(0.2))
  }

  /** BPE-ish subword count: letter runs, single digits, single
    * punctuation marks — the pre-tokenizer shape GPT-style BPE applies
    * before merges.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))
  def bpeishTokenCountSql(text: String): String =
    s"len(regexp_extract_all(lower($text), '[a-z]+|[0-9]|[^a-z0-9\\s]'))"

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "in", "on", "to", "and", "or", "is", "are", "was", "be")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    stopwordRatioOf(tokens(text), stopwords)
  def stopwordRatioSql(text: String, stopwords: Seq[String] = defaultStopwords): String = {
    val list = stopwords.map(s => s"'$s'").mkString(", ")
    val t = tokensSql(text)
    s"CAST(len(list_filter($t, x -> x IN ($list))) AS DOUBLE) / len($t)"
  }

  /** Fraction of non-alphanumeric, non-space characters. */
  // greatest(len, 1): empty text is 0 punctuation, not a 0/0 (which
  // throws under ANSI mode and NaN-mismatches the oracle otherwise)
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(lower(text), "[a-z0-9\\s]", ""))).cast("double") /
      greatest(length(text), lit(1))
  def punctRatioSql(text: String): String =
    s"CAST(length($text) - length(regexp_replace(lower($text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / greatest(length($text), 1)"

  /** Mean token length — a crude fluency signal. */
  def meanTokenLen(text: Column): Column = meanTokenLenOf(tokens(text))
  def meanTokenLenSql(text: String): String = {
    val t = tokensSql(text)
    s"CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($t, x -> CAST(length(x) AS BIGINT))), (a, b) -> a + b) AS DOUBLE) / len($t)"
  }

  /** Composite quality score in [0,1]: length sweet-spot, low punct
    * noise, stopword presence. Deterministic arithmetic only (no
    * transcendentals — cross-engine ulp drift, see RelQueries).
    */
  def qualityScore(text: Column): Column = qualityScoreOf(text, tokens(text))
  def qualityScoreSql(text: String): String = {
    val lenScore = s"least(CAST(length($text) AS DOUBLE) / 200.0, 1.0)"
    val punctScore = s"greatest(1.0 - ${punctRatioSql(text)} * 4.0, 0.0)"
    val stopScore = s"least(${stopwordRatioSql(text)} * 5.0, 1.0)"
    s"($lenScore * 0.4 + $punctScore * 0.4 + $stopScore * 0.2)"
  }

  /** Marker-token language ID. Scores each language by its count of
    * high-frequency function words among the tokens; `und` when no
    * marker hits. N-gram-profile quality lives in the unit tests; this
    * column form is the codegen-friendly scale path.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "es"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "et"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"))

  def langId(text: Column): Column = langIdOf(tokens(text))
  def langIdSql(text: String): String = {
    val t = tokensSql(text)
    val scoreExprs = langMarkers.map { case (lang, markers) =>
      val list = markers.map(m => s"'$m'").mkString(", ")
      lang -> s"len(list_filter($t, x -> x IN ($list)))"
    }
    val best = scoreExprs.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
    val cases = scoreExprs.reverse.foldLeft("'und'") { case (acc, (lang, s)) =>
      s"CASE WHEN $s = ($best) AND ($best) > 0 THEN '$lang' ELSE $acc END"
    }
    cases
  }

  /** Polynomial rolling-hash document fingerprint over characters,
    * mod 1e9+7 (Karp-Rabin). Stays in BIGINT range (acc*131 + c <
    * 2^63) so it is exact and identical in any engine with 64-bit
    * integer arithmetic.
    */
  def fingerprint(text: Column): Column = {
    val codes = transform(regexp_extract_all(text, lit("."), lit(0)), ch => ascii(ch).cast("long"))
    aggregate(codes, lit(0L), (acc, c) => pmod(acc * lit(131L) + c, lit(1000000007L)))
  }
  def fingerprintSql(text: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(regexp_extract_all($text, '.'), ch -> CAST(unicode(ch) AS BIGINT))), (a, c) -> (a * 131 + c) % 1000000007)"
}

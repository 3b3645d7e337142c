package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Analyzer-chain semantics for ES-style `text` fields — the reference maps
  * `title`/`summary` as analyzed text with `.keyword` subfields
  * (`scripts/indexing/to_elasticsearch.py:121-129`): lowercase+tokenize
  * (TextFunctions.tokens), stop-word removal, and Porter stemming. The
  * chain is OFF by default everywhere else; search callers opt in.
  *
  * The stemmer is a from-scratch implementation of the PUBLISHED Porter
  * algorithm (M.F. Porter, "An algorithm for suffix stripping", Program
  * 14(3) 1980 — public domain); the canonical example pairs from the paper
  * are a registered query with a literal oracle, so any drift in the
  * implementation breaks the correctness gate.
  *
  * Scale shape: stemming is a per-token pure kernel inside a `transform`
  * over the token array — row-local, no shuffle, embarrassingly parallel.
  * The stop set is a broadcast-free literal.
  */
object Analyzer {

  /** Lucene's classic English stop set (public, EnglishAnalyzer). */
  val StopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with")

  // ---------------------------------------------------------------- porter
  private def isCons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(w, i - 1)
    case _ => true
  }

  /** m = number of VC sequences in [C](VC)^m[V]. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && isCons(w, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(w, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && isCons(w, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(w: String): Boolean = w.indices.exists(i => !isCons(w, i))

  private def doubleCons(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isCons(w, w.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def cvc(w: String): Boolean =
    w.length >= 3 && isCons(w, w.length - 3) && !isCons(w, w.length - 2) &&
      isCons(w, w.length - 1) && !"wxy".contains(w.charAt(w.length - 1))

  /** Apply the first matching (suffix → replacement) whose stem passes
    * `cond`; None when no suffix matches at all. */
  private def replaceSuffix(w: String, rules: Seq[(String, String)],
      cond: String => Boolean): Option[String] =
    rules.collectFirst {
      case (suf, rep) if w.endsWith(suf) =>
        val stem = w.substring(0, w.length - suf.length)
        if (cond(stem)) stem + rep else w
    }

  def porterStem(word: String): String = {
    if (word == null || word.length <= 2) return if (word == null) "" else word
    var w = word

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (w.endsWith("ss")) ()
    else if (w.endsWith("s")) w = w.dropRight(1)

    // step 1b
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else {
      val stripped =
        if (w.endsWith("ed") && hasVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped.foreach { s =>
        w = if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
        else if (doubleCons(s) && !"lsz".contains(s.charAt(s.length - 1))) s.dropRight(1)
        else if (measure(s) == 1 && cvc(s)) s + "e"
        else s
      }
    }

    // step 1c
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // step 2 (m > 0)
    w = replaceSuffix(w, Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble"),
      s => measure(s) > 0).getOrElse(w)

    // step 3 (m > 0)
    w = replaceSuffix(w, Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> ""),
      s => measure(s) > 0).getOrElse(w)

    // step 4 (m > 1; "ion" additionally requires the stem to end s or t)
    w = replaceSuffix(w, Seq(
      "al" -> "", "ance" -> "", "ence" -> "", "er" -> "", "ic" -> "",
      "able" -> "", "ible" -> "", "ant" -> "", "ement" -> "", "ment" -> "",
      "ent" -> "", "ion" -> "", "ou" -> "", "ism" -> "", "ate" -> "",
      "iti" -> "", "ous" -> "", "ive" -> "", "ize" -> ""),
      s => measure(s) > 1).map { out =>
      // the ion rule fired only if s/t precedes; undo otherwise
      if (w.endsWith("ion") && out == w.dropRight(3) &&
        !(out.endsWith("s") || out.endsWith("t"))) w
      else out
    }.getOrElse(w)

    // step 5a
    if (w.endsWith("e")) {
      val s = w.dropRight(1)
      val m = measure(s)
      if (m > 1 || (m == 1 && !cvc(s))) w = s
    }
    // step 5b
    if (measure(w) > 1 && doubleCons(w) && w.endsWith("l")) w = w.dropRight(1)
    w
  }

  // ------------------------------------------------------------- analyzer
  private lazy val stemArrayUdf = udf((toks: Seq[String]) =>
    if (toks == null) Seq.empty[String] else toks.map(porterStem))

  /** The analyzed token chain: whitespace tokens → stop-word filter →
    * (optionally) Porter stems. `stem = false` gives the stop-filtered
    * `.keyword`-style terms. */
  def analyzedTokens(c: Column, stem: Boolean = true): Column = {
    val noStops = filter(TextFunctions.tokens(c),
      t => !t.isInCollection(StopWords))
    if (stem) stemArrayUdf(noStops) else noStops
  }

  /** Analyzed full-text search: a document matches when any of its analyzed
    * tokens equals the analyzed query term — the ES `match`-on-`text`
    * semantic (inflections of the term hit; `.keyword` exact search stays
    * `TextFunctions.keywordSearch`). */
  def searchAnalyzed(spark: SparkSession, dir: String,
      term: String = "merge"): DataFrame = {
    val stem = porterStem(term.toLowerCase)
    Tables.documents(spark, dir)
      .filter(array_contains(analyzedTokens(col("text")), stem))
      .select(col("doc_id"), col("lang"), col("source"),
        substring(col("text"), 1, 60).as("snippet"))
  }

  /** Oracle for [[searchAnalyzed]] on the shipped corpora: the vocabulary
    * carries NO inflected forms (31 bare tokens; AnalyzerSpec asserts that
    * exactly one vocabulary token stems to porterStem(term)), so the
    * analyzed hit set equals token-equality containment — which DuckDB
    * evaluates directly. A future corpus with inflections would need the
    * family regex widened; the spec would fail first. */
  def searchAnalyzedSql(term: String = "merge"): String = {
    val esc = term.toLowerCase.replace("'", "''")
    raw"""SELECT doc_id, lang, source, substr(text, 1, 60) AS snippet
      |FROM documents
      |WHERE list_contains(
      |  list_filter(str_split(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'))), ' '),
      |              x -> x <> ''), '$esc')""".stripMargin
  }

  /** The canonical example pairs from the published Porter paper, run
    * through THIS implementation — with the expected stems as a literal
    * oracle, this pins the stemmer byte-for-byte. */
  val PorterExamples: Seq[(String, String)] = Seq(
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat", "feed" -> "feed",
    "agreed" -> "agre", "plastered" -> "plaster", "bled" -> "bled",
    "motoring" -> "motor", "sing" -> "sing", "conflated" -> "conflat",
    "troubled" -> "troubl", "sized" -> "size", "hopping" -> "hop",
    "tanned" -> "tan", "falling" -> "fall", "hissing" -> "hiss",
    "fizzed" -> "fizz", "failing" -> "fail", "filing" -> "file",
    "happy" -> "happi", "sky" -> "sky",
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc",
    "hesitanci" -> "hesit", "digitizer" -> "digit",
    "conformabli" -> "conform", "radicalli" -> "radic",
    "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit",
    "sensibiliti" -> "sensibl",
    "triplicate" -> "triplic", "formative" -> "form",
    "formalize" -> "formal", "electriciti" -> "electr",
    "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "communism" -> "commun",
    "activate" -> "activ", "angulariti" -> "angular",
    "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  /** Registered query: every example word stemmed by the implementation.
    * The `dir` parameter is unused (the vocabulary is the fixture). */
  def porterExamplesQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    PorterExamples.map(_._1).toDF("word")
      .select(col("word"), udf(porterStem _).apply(col("word")).as("stem"))
  }

  val porterExamplesSql: String = {
    val rows = PorterExamples
      .map { case (w, s) => s"  ('$w', '$s')" }.mkString(",\n")
    s"SELECT * FROM (VALUES\n$rows)\nAS t(word, stem)"
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data
  * pipelines: tokenization, quality signals, language ID,
  * fingerprinting. All pure `org.apache.spark.sql.functions`
  * compositions — codegen'd, no UDFs, so they stay inside whole-stage
  * codegen on the 100 TB scan path.
  */
object TextFunctions {

  /** Lowercased alphanumeric tokens, empties dropped. Native expression
    * ([[graft.functions.TokenSplit]], a byte-run scan) — exact match
    * for the regex the DuckDB oracles mirror (`[^a-z0-9]+` split with
    * empties filtered). */
  def tokens(text: Column): Column =
    graft.functions.HashFunctions.tokenSplit(lower(text))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Whitespace token count — `wc -w` semantics. */
  def whitespaceTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** GPT-2-style pre-tokenizer pattern: contractions, space-prefixed
    * letter runs, digit runs, symbol runs, whitespace runs. Kept free
    * of lookaheads so RE2-based engines (the DuckDB oracle) match the
    * JVM regex exactly. */
  val bpePiecePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish piece count: matches of [[bpePiecePattern]] — the standard
    * LLM pre-tokenization granularity, an upper-ish bound on real BPE
    * token count without a vocab. Codegen'd `regexp_extract_all`. */
  def bpePieceCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePiecePattern), lit(0))).cast("long")

  /** Keep the first `maxTokens` alphanumeric tokens, space-joined —
    * the token-budget truncation a context-window-bound pipeline
    * applies before packing. Narrow codegen'd slice, no shuffle. */
  def truncateTokens(text: Column, maxTokens: Int): Column =
    array_join(slice(tokens(text), 1, maxTokens), " ")

  /** Overlapping token-window chunks (array of space-joined strings):
    * windows of `chunkSize` tokens starting every `chunkSize - overlap`
    * tokens — the chunking step of embedding/retrieval pipelines. A doc
    * shorter than one chunk yields itself as a single chunk; the last
    * chunk may be short. Pure expression composition (sequence →
    * transform → slice), narrow and shuffle-free. */
  def chunkTokens(text: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val ts = tokens(text)
    val starts = sequence(lit(1),
      greatest(size(ts) - overlap, lit(1)), lit(step))
    transform(starts, s => array_join(slice(ts, s, lit(chunkSize)), " "))
  }

  /** PII scrub patterns — RE2-compatible (no lookaround) so the JVM
    * and the DuckDB oracle rewrite identically. Deliberately simple,
    * recall-oriented shapes: pipeline PII passes favor over-redaction. */
  val emailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern: String = "\\+?\\d[\\d() -]{7,}\\d"

  /** Redact emails then phone-shaped digit runs. Two codegen'd
    * `regexp_replace` passes, narrow map — no shuffle at any scale. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** HTML → text extraction patterns — RE2-compatible (non-greedy,
    * inline (?is) flags, no lookaround) so the JVM and DuckDB rewrite
    * identically. Element blocks whose CONTENT is never prose are
    * removed whole; every other tag drops but keeps its content. */
  val scriptBlockPattern: String = "(?is)<script\\b[^>]*>.*?</script>"
  val styleBlockPattern: String = "(?is)<style\\b[^>]*>.*?</style>"
  val commentPattern: String = "(?s)<!--.*?-->"
  val tagPattern: String = "(?s)<[^>]*>"

  /** Strip HTML to prose — the WET-extraction step of a web-crawl
    * pipeline: drop script/style blocks (content included), comments,
    * then every remaining tag; decode the five ubiquitous entities
    * (&amp; LAST so "&amp;lt;" can't double-decode); collapse runs of
    * whitespace the removed markup leaves behind. Six codegen'd
    * regexp_replace passes in one narrow map — no shuffle at any
    * scale, mirrored pattern-for-pattern in the oracle. Tag-soup
    * caveat (documented contract): an UNCLOSED <script>/<style> block
    * is not a block — its open tag strips like any tag and its
    * content surfaces as text; downstream quality filters (gopher,
    * classifier) are the backstop for that malformed sliver, the same
    * division of labor as real WET extraction. */
  def stripHtml(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(
        regexp_replace(text, scriptBlockPattern, " "),
        styleBlockPattern, " "),
      commentPattern, " ")
    val noTags = regexp_replace(noBlocks, tagPattern, " ")
    val decoded = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&#39;", "'"),
      "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Distinct-token ratio — a cheap lexical-diversity quality signal. */
  def distinctTokenRatio(text: Column): Column = {
    val ts = tokens(text)
    size(array_distinct(ts)).cast("double") /
      greatest(size(ts), lit(1)).cast("double")
  }

  /** Count of punctuation characters from a fixed set (explicit set so
    * engines with different `[[:punct:]]` tables agree). */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("long")

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    aggregate(ts, lit(0L), (acc, t) => acc + length(t).cast("long"))
      .cast("double") / greatest(size(ts), lit(1)).cast("double")
  }

  /** English stopword density — fraction of tokens in a small fixed
    * stopword list. */
  val stopwordsEn: Seq[String] =
    Seq("the", "a", "an", "of", "to", "in", "and", "is", "on", "for")

  def stopwordRatio(text: Column, stopwords: Seq[String] = stopwordsEn): Column = {
    val ts = tokens(text)
    val sw = array(stopwords.map(lit): _*)
    size(filter(ts, t => array_contains(sw, t))).cast("double") /
      greatest(size(ts), lit(1)).cast("double")
  }

  /** Adjacent word bigrams ("a b") of the token stream — empty when
    * the doc has fewer than two tokens. */
  def tokenBigrams(text: Column): Column = {
    val ts = tokens(text)
    val n = greatest(size(ts) - 1, lit(0))
    zip_with(slice(ts, lit(1), n), slice(ts, lit(2), n),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Highest multiplicity of any element of `arr`: sort + run-length
    * max — O(L log L) per row and fully codegen'd, never the O(L²)
    * count-each-distinct formulation (which is fine for a small
    * oracle, wrong for a 100 TB scan of long documents). */
  private def maxMultiplicity(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(x <=> acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Fraction of token occurrences taken by the single most frequent
    * token — the "repeated word" share of a Gopher-style repetition
    * rule set (Rae et al. 2021, arXiv:2112.11446 §A1.1 uses the
    * analogous top-n-gram character share). */
  def topTokenFraction(text: Column): Column = {
    val ts = tokens(text)
    maxMultiplicity(ts).cast("double") /
      greatest(size(ts), lit(1)).cast("double")
  }

  /** Fraction of bigram occurrences taken by the most frequent word
    * bigram — phrase-level repetition (loops, boilerplate, chant text
    * score high; natural prose stays low). */
  def topBigramFraction(text: Column): Column = {
    val bgs = tokenBigrams(text)
    maxMultiplicity(bgs).cast("double") /
      greatest(size(bgs), lit(1)).cast("double")
  }

  /** Gopher-style corpus keep/drop decision: length bounds, lexical
    * diversity, phrase repetition, and stopword presence composed into
    * one boolean — the document-level quality gate of an LLM data
    * pipeline (thresholds are corpus-tunable; defaults follow the
    * Gopher rules' shape adapted to short synthetic docs). All inputs
    * are int-ratio doubles, so the decision is engine-deterministic. */
  def gopherKeep(text: Column,
                 minTokens: Long = 20L, maxTokens: Long = 90L,
                 minDistinctRatio: Double = 0.4,
                 maxTopBigramFrac: Double = 0.05,
                 minStopwordRatio: Double = 0.02): Column = {
    val n = tokenCount(text)
    n >= minTokens && n <= maxTokens &&
      distinctTokenRatio(text) >= minDistinctRatio &&
      topBigramFraction(text) <= maxTopBigramFrac &&
      stopwordRatio(text) >= minStopwordRatio
  }

  /** Composite quality score in [0,1]-ish: rewards lexical diversity
    * and typical token length, penalizes punctuation soup. Pure
    * per-row double arithmetic → bitwise-deterministic everywhere. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val diversity = distinctTokenRatio(text)
    val punctPenalty = least(
      punctCount(text).cast("double") /
        greatest(length(text), lit(1)).cast("double") * lit(5.0), lit(1.0))
    (lenScore * lit(0.3) + diversity * lit(0.5) +
      (lit(1.0) - punctPenalty) * lit(0.2))
  }

  /** Tiny per-language stopword tables for the n-gram/stopword
    * language-ID heuristic. Deliberately small and fixed: the operator
    * contract is a deterministic scoring function, mirrored 1:1 in the
    * oracle SQL. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "to", "in", "and", "is", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "del", "las"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "you", "zai", "ta"))

  /** Language-ID: per-language stopword hit count; argmax, ties broken
    * by alphabetical language order (earlier lang wins — later langs
    * must strictly exceed). Native expression
    * ([[ArgMaxTokenSetGroup]]): one token pass over five hash sets
    * instead of five filter/array_contains traversals per row. */
  def langId(text: Column): Column = {
    val idx = graft.functions.HashFunctions.argMaxTokenSetGroup(
      tokens(text), langStopwords.map(_._2.toArray).toArray)
    element_at(array(langStopwords.map(l => lit(l._1)): _*), idx + 1)
  }

  /** Per-language character-trigram profiles for the n-gram language-ID
    * variant (frequent trigrams of each language, ASCII-folded). */
  val langTrigrams: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "ich", "sch", "ein", "die", "und", "den", "cht"),
    "en" -> Seq("the", "ing", "and", "ion", "tio", "ent", "for", "her"),
    "es" -> Seq("que", "los", "ado", "con", "cio", "las", "del", "una"),
    "fr" -> Seq("les", "ent", "des", "eur", "ait", "une", "our", "eau"),
    "zh" -> Seq("shi", "zhe", "ang", "eng", "ian", "uan", "hao", "men"))

  /** Character-n-gram language ID: per language, total non-overlapping
    * occurrence count of its profile trigrams in the lowercased text;
    * argmax with alphabetical tie-break. Native expression
    * ([[ArgMaxSubstringGroup]]): indexOf scans instead of one
    * regexp_replace pass per (language, trigram) — the replace-delta
    * SQL formulation stays the oracle mirror (same counts). */
  def langIdNgram(text: Column): Column = {
    val idx = graft.functions.HashFunctions.argMaxSubstringGroup(
      lower(text), langTrigrams.map(_._2.toArray).toArray)
    element_at(array(langTrigrams.map(l => lit(l._1)): _*), idx + 1)
  }

  /** Stable document fingerprint (md5 hex — identical in every engine). */
  def fingerprint(text: Column): Column = md5(text)

  /** Polynomial rolling hash over the character stream, mod a large
    * prime — a locality-insensitive content hash useful for chunk-level
    * dedup. Spark-side only (left-fold over characters). */
  def rollingHash(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, ch) => pmod(acc * lit(31L) + coalesce(ascii(ch).cast("long"), lit(0L)),
        lit(1000000007L)))
}

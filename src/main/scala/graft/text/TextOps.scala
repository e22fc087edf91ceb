package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (BASELINE.json
  * north star — beyond the reference's own surface). All pure Catalyst
  * built-in compositions (split / transform / filter / aggregate) — no
  * UDFs, no shuffle: each operator is a per-row projection that scales
  * linearly. (Higher-order functions evaluate interpreted inside the
  * surrounding codegen'd projection; where that became a measured
  * bottleneck — MinHash, SimHash — a native expression replaces the
  * composition, see graft.functions.)
  *
  * Engine-portability rule (for the DuckDB oracle): only constructs with an
  * exact DuckDB equivalent — md5 hex strings, regexp with explicit character
  * classes, left-to-right list folds.
  */
object TextOps {

  /** Whitespace tokenization. trim first: split("") yields [""], and leading
    * whitespace yields a phantom empty first token in both engines.
    */
  def tokens(text: Column): Column =
    split(trim(text), "\\s+")

  /** Token count (whitespace). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish subword-unit count: word-piece regex — runs of letters, runs of
    * digits, or single non-alnum-non-space symbols, the classic GPT-2-style
    * pre-tokenizer shape. Counted via regexp_count so Spark and DuckDB agree.
    */
  val BpeTokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenRegex))

  /** Quality-score ingredients: length, punctuation ratio, digit ratio,
    * mean token length, stopword ratio. Explicit punct set (not [[:punct:]])
    * so the class means the same bytes in every regex engine.
    */
  val PunctClass = "[.,!?;:'\"()\\[\\]{}-]"

  def punctCount(text: Column): Column = regexp_count(text, lit(PunctClass))
  def digitCount(text: Column): Column = regexp_count(text, lit("[0-9]"))

  /** English-ish stopword list used by both quality score and langId. */
  val StopwordsEn = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(lower(text)), t => t.isin(StopwordsEn.map(lit(_)): _*)))

  /** Composite quality score in [0,1]: rewards stopword presence and
    * moderate token length, penalizes punctuation/digit soup. Deterministic
    * double arithmetic (same expression tree both engines ⇒ bit-identical).
    */
  def qualityScore(text: Column): Column = {
    val n      = tokenCount(text).cast("double")
    val chars  = length(text).cast("double")
    val stopR  = stopwordCount(text).cast("double") / greatest(n, lit(1.0))
    val punctR = punctCount(text).cast("double") / greatest(chars, lit(1.0))
    val digitR = digitCount(text).cast("double") / greatest(chars, lit(1.0))
    val lenOk  = when(n >= 5 && n <= 10000, lit(1.0)).otherwise(lit(0.0))
    graft.ops.CoreOps.roundPortable(
      greatest(lit(0.0), least(lit(1.0),
        lit(0.4) * lenOk + lit(0.4) * least(stopR * lit(4.0), lit(1.0))
          - lit(0.1) * punctR - lit(0.1) * digitR + lit(0.3))),
      6)
  }

  /** n-gram-heuristic language ID: score text against small per-language
    * marker-token sets; argmax with deterministic tie-break by language code.
    * (The testdata's `lang` column is synthetic noise — the contract here is
    * determinism + engine-equivalence, asserted by the oracle.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "pour", "dans")
  )

  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isin(markers.map(lit(_)): _*)))

  /** Predicted language code, 'und' when no marker hits. Tie-break: first
    * language in alphabetical order wins (LangMarkers is sorted).
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (code, m) => code -> langScore(text, m) }
    val best   = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (code, s)) =>
      when(s === best && best > 0, lit(code)).otherwise(acc)
    }
    pick
  }

  /** Document fingerprint: md5 over the canonicalized token stream —
    * whitespace-normalized, lowercased — so texts differing only in spacing
    * hash identically. (Exact-dedup key; rolling-hash min-shingle variant
    * lives in dedup.Shingles.)
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(lower(text))))

  /** Polynomial rolling hash of the whole document:
    * h = fold(chars, 0, (h,c) => (h·31 + codepoint) mod 1e9+7).
    * One left-to-right pass; the fold body references only lambda vars, so
    * no HOF re-evaluation blowup. Engine-portable (same fold in DuckDB).
    */
  val HashMod = 1000000007L

  /** Characters of a string as a codepoint array; the filter drops the
    * trailing "" that Spark's limit=-1 split keeps for zero-width matches
    * (DuckDB's enumeration has no such element). */
  private def codepoints(text: Column): Column =
    transform(filter(split(text, ""), c => length(c) > 0), c => ascii(c).cast("long"))

  def rollingHash(text: Column): Column =
    when(length(text) === 0, lit(0L)).otherwise(
      aggregate(codepoints(text), lit(0L), (acc, c) => (acc * 31L + c) % HashMod))

  /** Winnowing-style document fingerprint: minimum polynomial hash over all
    * `window`-char windows. Native incremental Rabin-Karp expression —
    * O(chars) per doc (see [[graft.functions.MinWindowHash]]); the DuckDB
    * oracle keeps the equivalent per-window fold, which produces identical
    * values (modular polynomial hashing is associative). Equivalent
    * built-in composition, O(chars × window) with a per-window substring
    * split (7.7s on the r2 bench vs ~1s native):
    * {{{
    * array_min(transform(
    *   sequence(lit(1), greatest(length(text) - (window - 1), lit(1))),
    *   i => aggregate(codepoints(text.substr(i, lit(window))),
    *                  lit(0L), (acc, c) => (acc * 31L + c) % HashMod)))
    * }}}
    */
  def minWindowHash(text: Column, window: Int = 16): Column =
    graft.functions.MinWindowHash.min_window_hash(text, window)
}

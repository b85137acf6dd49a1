package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline extensions
  * (BASELINE.json north star): tokenization, shingling, fingerprinting,
  * language-ID and quality heuristics. Everything is built from
  * codegen'd `functions._` / higher-order array functions — no UDFs —
  * so the whole pipeline stays inside whole-stage codegen and scales
  * with the scan.
  *
  * Determinism contract: any hashing uses md5 (bit-identical in Spark
  * and DuckDB) and any ratio uses integer division, so every op here is
  * oracle-checkable.
  */
object TextOps {

  /** Whitespace tokenization (the documents corpus is pre-normalized;
    * a BPE-ish regex split is provided separately). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-flavored subword-ish tokenization: splits on word boundaries
    * and keeps punctuation as its own tokens, the usual pre-tokenizer
    * shape (GPT-2 style `\w+|[^\w\s]`). */
  def regexTokens(text: Column): Column =
    filter(split(text, "(?<=\\W)|(?=\\W)"), t => trim(t) =!= "")

  /** Word k-gram shingles over a token array; empty when the doc has
    * fewer than k tokens. sequence() is guarded — Spark generates a
    * DESCENDING sequence when stop < start, which would silently
    * produce garbage shingles. */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array())

  /** Canonical-text fingerprint: md5 of the lowercased,
    * whitespace-collapsed text. The md5 is computed distributed,
    * per-row, inside codegen — the classic exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** Polynomial rolling-hash fingerprint over the token sequence
    * (Rabin-Karp shape): h = Σ tᵢ·Bⁱ mod M with md5-derived token
    * codes, folded left-to-right in one `aggregate` pass. ORDER-
    * SENSITIVE — permuted documents get different fingerprints, unlike
    * [[fingerprint]]'s canonical-text hash; use it when token order is
    * part of document identity. Constants sized so acc·B + t never
    * overflows a signed long. Expects a staged token-code column (see
    * the HOF staging note in graft.queries.Dedup).
    */
  val RollB = 31L
  val RollM = 999999999999989L // < 2^50, prime; 31·M + 2^32 < 2^63
  def tokenCodes(toks: Column): Column =
    transform(toks, t => conv(substring(md5(t.cast("binary")), 1, 8), 16, 10).cast("long"))

  /** 16-bit md5-derived token codes (the SimHash input domain). */
  def tokenCodes16(toks: Column): Column =
    transform(toks, t => conv(substring(md5(t.cast("binary")), 1, 4), 16, 10).cast("long"))
  def rollingFingerprint(tokCodes: Column): Column =
    aggregate(tokCodes, lit(0L), (acc, t) => (acc * RollB + t) % RollM)

  /** Count of tokens drawn from a marker set (stopword/language
    * votes) — native kernel ([[graft.functions.MarkerCount]]): one
    * hash probe per token inside codegen, no interpreted filter pass,
    * no intermediate array. Runs in every quality/language gate
    * (q21/q22 and the q50 pipeline's triage). */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    graft.functions.LexiconFunctions.marker_count(toks, markers)

  /** HOF spelling of [[markerCount]] — the differential-test
    * reference (interpreted filter + size). */
  def markerCountHof(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*)))

  val enMarkers = Seq("the", "and", "of", "to", "a")
  val deMarkers = Seq("der", "die", "das", "und", "ist")
  val frMarkers = Seq("le", "la", "les", "et", "est")
  val esMarkers = Seq("el", "los", "las", "que", "es")

  /** n-gram-heuristic language ID: marker-word votes with a fixed
    * precedence (en > de > fr > es) so ties are deterministic. */
  def langId(toks: Column): Column = {
    val en = markerCount(toks, enMarkers)
    val de = markerCount(toks, deMarkers)
    val fr = markerCount(toks, frMarkers)
    val es = markerCount(toks, esMarkers)
    when(en >= de && en >= fr && en >= es && en > 0, lit("en"))
      .when(de >= fr && de >= es && de > 0, lit("de"))
      .when(fr >= es && fr > 0, lit("fr"))
      .when(es > 0, lit("es"))
      .otherwise(lit("unknown"))
  }

  /** Integer-percentage quality signals (integer division keeps the
    * oracle comparison exact — no float ratios). */
  def stopwordPct(toks: Column): Column =
    (markerCount(toks, enMarkers) * 100 / size(toks)).cast("long")
  def uniquePct(toks: Column): Column =
    (size(array_distinct(toks)) * 100 / size(toks)).cast("long")

  /** Quality bucket: the length / stopword-ratio / repetitiveness
    * triage a pretraining pipeline applies before expensive stages. */
  def qualityBucket(toks: Column, nChars: Column): Column =
    when(size(toks) < 10 || nChars < 50, lit("too_short"))
      .when(stopwordPct(toks) > 30, lit("high_stopword"))
      .when(uniquePct(toks) < 30, lit("repetitive"))
      .otherwise(lit("ok"))
}

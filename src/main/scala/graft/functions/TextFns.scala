package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text operators.
  *
  * O1/O2 router parity (reference: ollama_router.py:41-55) plus the
  * text-analysis battery a large-scale training-data pipeline needs
  * (language ID, quality scoring, token counting, fingerprinting).
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * — zero UDFs in these paths, so whole-stage codegen spans stay wide
  * and every op is DuckDB-oracle-expressible.
  */
object TextFns {

  /** Alias alternation, longest-first (reference sorts by length desc,
    * ollama_router.py:41-44). No word boundary — `x@copilotfoo` matches,
    * same as the reference. */
  val TriggerPattern: String =
    "(?i)(@blackboxprogramming|@copilot|@lucidia|@ollama)"

  /** O1 `detect_trigger` (ollama_router.py:47-50): leftmost
    * case-insensitive alias match, lowercased; empty string ↔ None. */
  def detectTrigger(c: Column): Column =
    lower(regexp_extract(c, TriggerPattern, 1))

  /** O2 `strip_triggers` (ollama_router.py:53-55): remove every alias
    * occurrence, then trim. */
  def stripTriggers(c: Column): Column =
    trim(regexp_replace(c, TriggerPattern, ""))

  /** O4 `route` routing decision (ollama_router.py:103-130) minus the
    * HTTP hop (zero-egress): adds `trigger`, `routed`, `prompt`. */
  def routeCols(text: Column): (Column, Column, Column) = {
    val trig = detectTrigger(text)
    (trig, trig =!= lit(""), stripTriggers(text))
  }

  /** Whitespace tokens. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish sub-word count: runs of letters, runs of digits, single
    * other non-space chars — a cheap stand-in for a real tokenizer's
    * piece count. */
  def bpeishCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Tiny multi-language stopword inventories for the n-gram-free
    * language-ID heuristic. Deterministic, order-stable. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "dans", "que", "pas"))

  /** Language-ID heuristic: score = |tokens ∩ stopwords(lang)| per
    * language; argmax with deterministic tie order (en > de > es > fr >
    * unknown). Pure column algebra — scales as a map-side expression. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = Seq("en", "de", "es", "fr").map { lang =>
      lang -> size(array_intersect(toks,
        array(Stopwords(lang).map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s > 0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Quality-score component columns (length, token stats, stopword
    * ratio, punctuation ratio, alpha ratio) — the usual cheap filters a
    * pretraining pipeline applies before anything expensive. */
  def qualityCols(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks)
    val nChar = length(text)
    val stop = array(Stopwords("en").map(lit): _*)
    Seq(
      "n_tokens" -> nTok,
      "mean_token_len" ->
        round(aggregate(toks, lit(0), (a, t) => a + length(t))
          .cast("double") / nTok, 6),
      "stopword_ratio" ->
        round(size(array_intersect(transform(toks, t => lower(t)), stop))
          .cast("double") / nTok, 6),
      "punct_ratio" ->
        round((nChar - length(regexp_replace(text, "[^\\w\\s]", "")))
          .cast("double") / nChar, 6),
      "alpha_ratio" ->
        round(length(regexp_replace(text, "[^A-Za-z]", ""))
          .cast("double") / nChar, 6))
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercased
    * text — the exact-dup key that survives formatting noise. (The
    * rolling-hash shingle variant lives in [[graft.operators.Dedup]].) */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Fixed-size overlapping character chunks — the context-window prep
    * step of a training pipeline (long doc → model-sized pieces whose
    * `overlap` keeps boundary-spanning content intact in some chunk).
    * Chunk i covers [i·stride, i·stride + size) with
    * stride = size - overlap; the final partial chunk is kept (a tail
    * shorter than `overlap` would duplicate retained content and is
    * not emitted as its own chunk). Pure column algebra over one
    * `sequence`+`transform` whose lambda touches only the (cheap)
    * source column — map-side, no shuffle, SQL-replayable. */
  def chunkText(text: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"chunkText: size=$size overlap=$overlap")
    val stride = size - overlap
    val n = length(text)
    // number of stride-steps whose chunk ADDS content: ceil((n-overlap)/stride)
    val nChunks = greatest(lit(1),
      ceil((n - lit(overlap)).cast("double") / stride).cast("int"))
    transform(sequence(lit(0), nChunks - 1),
      i => text.substr(i * stride + 1, lit(size)))
  }

  /** Token-budget chunking — the context-packing twin of [[chunkText]]:
    * whitespace tokens grouped into consecutive chunks of at most
    * `k` tokens (training/context windows are token-, not
    * char-denominated). Map-side array algebra: split once, slice per
    * chunk — no shuffle, and the slice arithmetic replays verbatim in
    * SQL list slicing. Empty/whitespace-only (and null) text yields an
    * EMPTY array — split(trim(''), ..) is [''] (size 1), so without
    * the guard the floor of one chunk would emit a phantom
    * empty-string chunk for blank docs (ADVICE r6). */
  def chunkTokens(text: Column, k: Int): Column = {
    require(k > 0, s"chunkTokens: k=$k")
    val toks = split(trim(text), "\\s+")
    val nChunks = ceil(size(toks).cast("double") / k).cast("int")
    // rlike, not trim: Spark's trim strips only ' ' — a tab/newline-only
    // doc would still sneak one phantom chunk past a trim-length guard
    when(text.rlike("\\S"),
      transform(sequence(lit(0), greatest(lit(1), nChunks) - 1),
        i => array_join(slice(toks, i * k + 1, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Repetition quality signals (the Gopher/C4 family): fraction of
    * repeated tokens, mass of the single most frequent token, and mass
    * of the most frequent word bigram. High values mark boilerplate /
    * degenerate generations that a pretraining pipeline drops before
    * anything expensive.
    *
    * All three are computed per-document in one map-side expression —
    * no explode, no shuffle. The mode count is O(distinct·n) per doc
    * (each distinct token rescans the token list); doc lengths are
    * bounded by upstream chunking, so at 100 TB this stays a constant
    * per-row cost that beats the alternative (explode → groupBy over
    * ~10¹¹ (doc,token) rows) by the width of a full shuffle. */
  /** Count of the most frequent element of a string array: sort, then
    * one fold tracking the current and best run length — O(n log n)
    * per row. (The obvious `array_distinct`+`filter` mode scan is
    * O(distinct·n) string compares per row and measured 18× the CPU of
    * this fold on the sf0.1 corpus.) */
  private def modeCount(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit(0).as("best"), lit(0).as("run"),
        lit(null).cast("string").as("prev")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(greatest(acc.getField("best"), run).as("best"),
          run.as("run"), x.as("prev"))
      },
      acc => acc.getField("best"))

  def repetitionCols(text: Column): Seq[(String, Column)] = {
    val toks = tokens(lower(text))
    val n = size(toks)
    val bigrams = transform(sequence(lit(1), n - 1),
      i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1)))
    Seq(
      "dup_token_ratio" -> round(
        (n - size(array_distinct(toks))).cast("double") / n, 6),
      "top_token_frac" -> round(modeCount(toks).cast("double") / n, 6),
      "top_bigram_frac" -> when(n < 2, lit(null).cast("double"))
        .otherwise(round(modeCount(bigrams).cast("double") / (n - 1), 6)))
  }

  /** PII redaction patterns, deliberately restricted to syntax valid in
    * BOTH Java regex (Spark) and RE2 (DuckDB oracle): character
    * classes, bounded repetition, `\b` — no lookaround, no
    * backreferences. Order matters: emails first (so their dotted
    * domains can't be half-eaten by the IP pass). */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<IP>",
    "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}" -> "<PHONE>")

  /** Scrub emails / IPv4s / intl-format phone numbers to typed
    * placeholders — the compliance pass a training pipeline runs before
    * retention. Chain of codegen'd `regexp_replace`, map-side. */
  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /** Winnowing document fingerprints (the MOSS scheme): the minimum
    * 12-hex-char-md5 gram hash of each w-window of character k-grams,
    * distinct + sorted. Delegates to the native codegen'd expression
    * [[graft.plans.WinnowFps]] — see its Scaladoc for the scheme, the
    * oracle replay, and why the pure-HOF formulation was retired
    * (interpreter-bound: ~20k lambda evals and fresh MessageDigests
    * per row). Documents shorter than k+w-1 chars yield an empty
    * array. */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    graft.plans.WinnowFps.column(text, k, w)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocklist / content-safety filtering — the "remove documents
  * containing any banned phrase" gate every training-data pipeline
  * runs (license strings, PII markers, policy phrases, benchmark
  * canaries). Matching is lowercased SUBSTRING containment, so
  * multi-word phrases work without tokenizer agreement.
  *
  * Scale shape: the term list rides as ONE broadcast array literal and
  * matching is a codegen'd map-side higher-order filter — zero
  * shuffle, zero joins, cost O(|docs| · Σ|terms|) streamed through
  * whole-stage codegen. For blocklists beyond a few thousand terms the
  * scan-per-term product dominates and an Aho-Corasick automaton in a
  * `mapPartitions` is the next dial — the API shape (docs in, matched
  * terms out) would not change.
  */
object Blocklist {

  /** Per-document matched terms: (idCol, matched, n_matched), where
    * `matched` is the comma-joined sorted list of blocklist terms the
    * document contains (deterministic rendering — array cells don't
    * sort under the driver's frame compare). Unmatched documents carry
    * an empty string and 0 — callers filter whichever side they need
    * (quarantine review vs clean-corpus pass-through). */
  def matchTerms(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "matchTerms: need at least one blocklist term")
    require(terms.forall(_.nonEmpty), "matchTerms: empty term matches everything")
    val arr = typedLit(terms.map(_.toLowerCase).distinct.sorted)
    docs.select(
      col(idCol),
      array_join(
        filter(arr, t => contains(lower(col(textCol)), t)), ",").as("matched"),
      size(filter(arr, t => contains(lower(col(textCol)), t))).as("n_matched"))
  }

  /** The pass-through side of the gate: documents matching NO
    * blocklist term, original schema preserved. A null text matches
    * nothing and passes through — the coalesce keeps the partition
    * invariant with [[matchTerms]] (whose HOF filter treats the null
    * lambda as no-match); without it `!exists` is NULL for null text
    * and the row would silently vanish from BOTH sides (review r9). */
  def clean(
      docs: DataFrame, textCol: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "clean: need at least one blocklist term")
    val arr = typedLit(terms.map(_.toLowerCase).distinct.sorted)
    docs.filter(
      coalesce(!exists(arr, t => contains(lower(col(textCol)), t)), lit(true)))
  }
}

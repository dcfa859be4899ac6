package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level term statistics — the tf-idf pass of a training-data
  * pipeline (salient-term extraction, keyword-based filtering,
  * per-domain vocabulary drift).
  *
  * Scoring uses a RATIONAL idf — score = tf · ⌊10⁶·(N+1)/(df+1)⌋ in
  * pure integer arithmetic — rather than the textbook ln((N+1)/(df+1)).
  * ln is a libm call whose last-ulp behavior differs between JVMs and
  * C engines, which would make a hash-compared oracle flaky; the
  * rational form is engine-exact, and for FIXED tf it orders terms
  * identically (x ↦ ln x is monotone). Callers who want the classic
  * value can apply ln to score/tf/10⁶ downstream — the ranking below
  * is the product the pipeline consumes.
  *
  * Shape at scale: one shuffle to (doc, term) for tf, then df as a
  * COUNT window over tf partitioned by term — not a separate
  * `tf.groupBy(term)` + join, which would make Spark derive the whole
  * scan→explode→tf subtree twice (a diamond DAG is re-computed, not
  * shared, and exchange reuse is not guaranteed across different
  * parent aggregates; `.explain` showed both subtrees). The window
  * costs one exchange on term and touches each tf row once. Hot terms
  * ("the" in every doc) skew a term partition to df(term) rows, but
  * the tf⋈df join shuffles the same rows to the same reducer anyway —
  * the skew is inherent to exact df, the window just stops paying the
  * second scan. The corpus count joins as a broadcast 1-row cross; the
  * per-doc top-k window partitions are doc-sized, no skew concern.
  */
object CorpusStats {

  /** Top-k salient terms per document: (doc_id, term, tf, df, score,
    * rank), rank by score desc with term asc tie-break. Tokenization is
    * whitespace on lowercased trimmed text — mirror of
    * [[graft.functions.TextFns]] token counting. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * expr("(n_docs + 1) * 1000000L div (df + 1)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("term").asc)))
      .where(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "score", "rank")
  }

  /** Top-k bigram collocations with LIFT — how much more often two
    * tokens co-occur adjacently than independence predicts. The classic
    * score is PMI = ln(lift); like tf-idf above, the ln stays out of
    * the engine (libm last-ulp variance would break a hash oracle, and
    * ln is monotone so the ranking is unchanged) — lift is computed as
    * one double division of exact integer products, bit-identical on
    * any IEEE engine:  lift = (c_ab · n_total) / (c_a · c_b).
    *
    * Shape at scale: bigrams explode linearly in corpus tokens (not
    * quadratically — adjacency only), one hash agg with map-side
    * combine absorbs hot pairs, TakeOrdered keeps the top-k without a
    * full sort, and the unigram counts join only onto the k survivors
    * (2k lookups, broadcast-sized regardless of vocabulary). */
  def collocations(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val bigrams = when(size(toks) < 2, array())
      .otherwise(transform(
        sequence(lit(0), size(toks) - 2),
        i => concat(element_at(toks, i + 1), lit(" "), element_at(toks, i + 2))))
    val uni = docs.select(explode(toks).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      // vocab-sized frame feeding three parents (total + two survivor
      // joins) — materialize once or the explode+agg subtree reruns
      .localCheckpoint(false)
    // n_total is the sum of the unigram counts — no third tokenize pass
    val total = uni.agg(sum(col("c")).as("n_total"))
    val top = docs.select(explode(bigrams).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bg").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("bg").asc)))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .withColumn("w2", element_at(split(col("bg"), " "), 2))
    top
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
      .crossJoin(broadcast(total))
      // each factor goes to double BEFORE the multiply: a Long×Long
      // product overflows at ~10^19 (hot bigram × web-scale n_total)
      // and non-ANSI Spark would wrap silently; the double products
      // are correctly rounded, so the round-6 lift is still engine-exact
      .withColumn("lift", round(
        (col("cnt").cast("double") * col("n_total").cast("double")) /
          (col("c1").cast("double") * col("c2").cast("double")), 6))
      .select("rank", "bg", "cnt", "lift")
  }

  /** Corpus-wide heavy hitters: the k most frequent tokens with counts
    * and corpus mass. Exact path: explode → hash agg → `TakeOrdered`
    * (orderBy+limit plans as a per-partition top-k + driver merge of
    * 32·k rows, NOT a full sort). Map-side partial aggregation absorbs
    * hot-term skew before the exchange — "the" arrives at its reducer
    * as one partial count per map partition, not one row per
    * occurrence.
    *
    * The sketch path for when even the distinct-term aggregate is too
    * wide (per-minute heavy hitters over a firehose): a count-min
    * sketch aggregate (`count_min_sketch`, mergeable, fixed ε·δ memory)
    * estimates the same counts one-pass; CorpusStatsSpec bounds its
    * error against this exact path. */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val total = docs.select(
      sum(size(split(trim(lower(col(textCol))), "\\s+"))).as("n_total"))
    docs.select(
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("term").asc)))
      .crossJoin(broadcast(total))
      .withColumn("corpus_frac",
        round(col("cnt").cast("double") / col("n_total"), 6))
      .select("rank", "term", "cnt", "corpus_frac")
  }

  /** N-gram novelty score — the memorization/boilerplate dial from the
    * opposite side of dedup: per document, the fraction of its
    * DISTINCT word n-grams that occur in NO other document. 1.0 =
    * fully novel text; low scores flag template soup and near-copies
    * that survived doc-level dedup.
    *
    * [[Dedup.shingles]] already emits per-doc-distinct grams, so the
    * exploded (md5(gram), doc) stream needs no extra distinct: one
    * digest-keyed aggregate counts each gram's document spread, and
    * one doc-keyed aggregate folds the novel fraction — two keyed
    * exchanges over gram instances, never all-pairs, digests (16
    * bytes) riding the shuffle instead of gram text. */
  def ngramNovelty(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
        explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .select(col("id"), md5(col("gram")).as("g"))
      .localCheckpoint(false) // feeds the spread agg AND the join side
    val spread = grams.groupBy(col("g")).agg(count(lit(1)).as("nd"))
    grams.join(spread, Seq("g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("nd") === 1, lit(1L)).otherwise(lit(0L)))
          .as("n_novel"))
      .withColumn("novelty", round(
        col("n_novel").cast("double") / col("n_grams").cast("double"), 6))
  }
}

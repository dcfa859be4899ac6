package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * quality dial: score every document by how surprising its token
  * sequence is under a bigram LM trained on a corpus. Low surprisal ≈
  * fluent, in-distribution text; high surprisal flags boilerplate
  * soup, OCR noise, wrong-language shards — the classic perplexity
  * filter of large-scale training-data pipelines.
  *
  * Model: add-1 (Laplace) smoothed bigram LM over lowercase
  * `[a-z0-9]+` tokens (the corpus-stats tokenization):
  * P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V), V = |training vocab|.
  * Bigrams and heads unseen in training fall back to c = 0 — the
  * smoothing floor 1/(0 + V) — so a model trained on one corpus
  * scores ANY other corpus (the domain-filter shape: train on a
  * curated in-domain sample, score the raw crawl).
  *
  * Per-document score = mean token NLL — each bigram contributes
  * round(-ln P, 6), and the per-doc mean is an EXACT decimal sum of
  * those rounded terms divided by the bigram count, so the result is
  * independent of Spark's aggregation order (the fit-transform /
  * statistics convention; a raw double sum drifts in the last ulp
  * with merge order). `exp(avg_nll)` would be perplexity; the
  * monotone avg_nll itself is the ranking quantity, so the exp is
  * left to consumers.
  *
  * Scale shape: ONE tokenize pass per corpus feeds the count tables;
  * unigram and bigram counts are vocab-bounded aggregates (keyed
  * exchanges, never all-pairs); scoring joins each document bigram
  * against the count tables on the word keys — hash-partitioned
  * equi-joins that AQE can re-plan, no driver-side model
  * materialization (the LM "model" IS a pair of DataFrames, exactly
  * how a 100 TB corpus wants its counts held).
  */
object LangModel {

  /** Lowercase `[a-z0-9]+` token array per row (empty when none).
    * NOTE: stricter than [[CorpusStats]]' bare whitespace split —
    * punctuation-bearing and non-ASCII tokens are EXCLUDED here, so
    * LM vocabularies and CorpusStats heavy-hitter counts are not
    * directly comparable (r12 review fix: the doc previously implied
    * one shared tokenization). */
  private def alnumTokens(textCol: String) =
    expr(s"filter(split(trim(lower($textCol)), '\\\\s+'), " +
      "w -> w rlike '^[a-z0-9]+$')")

  /** Adjacent token pairs; `sequence(1, n-1)` would run DESCENDING for
    * n < 2, hence the guard. */
  private def bigramsExpr =
    when(size(col("ws")) < 2,
      expr("array()").cast("array<struct<w1:string,w2:string>>"))
      .otherwise(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> struct(ws[i-1] AS w1, ws[i] AS w2))"))

  /** Per-document add-1 bigram surprisal of `score` under the LM
    * trained on `train`: (idCol, n_bigrams, avg_nll). Documents with
    * fewer than two alphanumeric tokens carry no bigram and drop out —
    * their fluency is undefined, not zero. */
  def bigramNllAgainst(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val trainToks = train.select(alnumTokens(textCol).as("ws"))
    val uni = trainToks.select(explode(col("ws")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bi = trainToks.select(explode(bigramsExpr).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val pairs = score.select(col(idCol), alnumTokens(textCol).as("ws"))
      .select(col(idCol), explode(bigramsExpr).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    pairs
      .join(bi, Seq("w1", "w2"), "left")   // unseen bigram → cb = 0
      .join(uni, Seq("w1"), "left")        // unseen head → cu = 0
      .join(broadcast(vocab), lit(true), "inner")
      .withColumn("nll", round(-log(
        (coalesce(col("cb"), lit(0L)) + 1).cast(DoubleType) /
          (coalesce(col("cu"), lit(0L)) + col("v")).cast(DoubleType)), 6))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("nll").cast(DecimalType(18, 6))).as("__s"))
      .withColumn("avg_nll",
        round(col("__s").cast(DoubleType) / col("n_bigrams"), 6))
      .drop("__s")
  }

  /** Self-scoring form: the LM is trained on the corpus it scores
    * (every bigram/head is then seen, c ≥ 1). */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramNllAgainst(docs, docs, idCol, textCol)

  /** Jelinek-Mercer interpolated bigram LM — the smoothing production
    * perplexity filters actually use (add-1 alone over-penalizes rare
    * but fluent continuations):
    * P(w2|w1) = λ·c(w1 w2)/c(w1) + (1−λ)·(c(w2)+1)/(N+V),
    * with the ML bigram term defined 0 for an unseen head. λ rides as
    * the rational `lamNum/lamDen` so both engines evaluate the same
    * double arithmetic; same 6-dp-rounded-NLL / exact-decimal-mean
    * determinism contract as [[bigramNllAgainst]]. */
  def bigramNllInterpolated(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      lamNum: Int = 8,
      lamDen: Int = 10): DataFrame = {
    // lamNum == lamDen (pure-bigram) is excluded (r12 review fix):
    // an unseen bigram's probability would be exactly 0, log(0) is
    // NULL in Spark, the DECIMAL sum skips it but n_bigrams counts it
    // — a silently underestimated avg_nll. The unigram floor must
    // carry nonzero weight for the interpolation to be total.
    require(lamDen > 0 && lamNum >= 0 && lamNum < lamDen,
      s"lambda $lamNum/$lamDen must lie in [0, 1) — the unigram " +
        "backoff needs nonzero weight or unseen bigrams hit log(0)")
    val trainToks = train.select(alnumTokens(textCol).as("ws"))
    val uni = trainToks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val totals = uni.agg(count(lit(1)).as("v"), sum(col("cu")).as("n"))
    val bi = trainToks.select(explode(bigramsExpr).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val pairs = score.select(col(idCol), alnumTokens(textCol).as("ws"))
      .select(col(idCol), explode(bigramsExpr).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val u1 = uni.select(col("w").as("w1"), col("cu").as("cu1"))
    val u2 = uni.select(col("w").as("w2"), col("cu").as("cu2"))
    val pBi = when(coalesce(col("cu1"), lit(0L)) > 0,
      coalesce(col("cb"), lit(0L)).cast(DoubleType) / col("cu1"))
      .otherwise(lit(0.0))
    val pUni = (coalesce(col("cu2"), lit(0L)) + 1).cast(DoubleType) /
      (col("n") + col("v")).cast(DoubleType)
    pairs
      .join(bi, Seq("w1", "w2"), "left")
      .join(u1, Seq("w1"), "left")
      .join(u2, Seq("w2"), "left")
      .join(broadcast(totals), lit(true), "inner")
      .withColumn("nll", round(-log(
        (lit(lamNum) * pBi + lit(lamDen - lamNum) * pUni) / lit(lamDen)), 6))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("nll").cast(DecimalType(18, 6))).as("__s"))
      .withColumn("avg_nll",
        round(col("__s").cast(DoubleType) / col("n_bigrams"), 6))
      .drop("__s")
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * under TWO n-gram LMs — one trained on an in-domain target sample,
    * one on the raw corpus — and weight it by how much more likely the
    * target model finds it. Per-token log importance ratio
    * logw = avg_nll_raw − avg_nll_target (positive = target-like), and
    * the resampling weight is round(min(1, base·e^logw), 6): the
    * ROUNDING is load-bearing — downstream `hashKeepWeighted`
    * membership derives a 48-bit cut from the weight, and two engines'
    * `exp` may differ in the last ulp; rounding both to 6 dp first
    * makes the cut (and therefore membership) bit-identical
    * cross-engine, where a raw-double cut would disagree on ~% of rows.
    *
    * Both LM scorings inherit [[bigramNllAgainst]]'s shape:
    * vocab-bounded count aggregates + word-keyed equi-joins, one
    * tokenize pass each, no driver-side model. The in-domain sample is
    * the caller's (typically a [[Sampling.hashKeep]] cut, so the whole
    * pipeline — sample, two LMs, weights, membership — replays in SQL).
    *
    * Returns (idCol, n_bigrams, nll_raw, nll_target, logw, weight) for
    * every document with ≥ 1 bigram. */
  def dsirWeights(
      corpus: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      baseRate: Double = 0.5): DataFrame = {
    require(baseRate > 0.0 && baseRate <= 1.0, s"baseRate=$baseRate")
    // ONE corpus tokenize feeds the raw-LM counts AND both scoring
    // passes — composing bigramNll + bigramNllAgainst naively costs
    // four tokenize+regex passes over the corpus (measured 26.8 cpu s
    // at sf0.1); the shared exploded pair frame is pinned because it
    // has three consumers (raw joins, target joins, the per-doc fold)
    val toks = corpus.select(col(idCol), alnumTokens(textCol).as("ws"))
      .localCheckpoint(false)
    val uni = toks.select(explode(col("ws")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bi = toks.select(explode(bigramsExpr).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val pairs = toks.select(col(idCol), explode(bigramsExpr).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .localCheckpoint(false)
    val raw = pairs
      .join(bi, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .join(broadcast(vocab), lit(true), "inner")
      .withColumn("nll", round(-log(
        (col("cb") + 1).cast(DoubleType) /
          (col("cu") + col("v")).cast(DoubleType)), 6))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("nll").cast(DecimalType(18, 6))).as("__s"))
      .withColumn("nll_raw",
        round(col("__s").cast(DoubleType) / col("n_bigrams"), 6))
      .drop("__s")
    val tgtToks = target.select(alnumTokens(textCol).as("ws"))
    val uniT = tgtToks.select(explode(col("ws")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val vocabT = uniT.agg(count(lit(1)).as("v"))
    val biT = tgtToks.select(explode(bigramsExpr).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val tgt = pairs
      .join(biT, Seq("w1", "w2"), "left")
      .join(uniT, Seq("w1"), "left")
      .join(broadcast(vocabT), lit(true), "inner")
      .withColumn("nll", round(-log(
        (coalesce(col("cb"), lit(0L)) + 1).cast(DoubleType) /
          (coalesce(col("cu"), lit(0L)) + col("v")).cast(DoubleType)), 6))
      .groupBy(col(idCol))
      .agg(sum(col("nll").cast(DecimalType(18, 6))).as("__s"),
        count(lit(1)).as("__n"))
      .withColumn("nll_target",
        round(col("__s").cast(DoubleType) / col("__n"), 6))
      .select(col(idCol), col("nll_target"))
    raw.join(tgt, Seq(idCol))
      .withColumn("logw", round(col("nll_raw") - col("nll_target"), 6))
      .withColumn("weight",
        round(least(lit(1.0), lit(baseRate) * exp(col("logw"))), 6))
  }
}

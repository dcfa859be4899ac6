package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank-fusion for hybrid retrieval: combine rankings produced by
  * different scorers (BM25-ish keyword rank, embedding cosine rank,
  * freshness…) without comparing their incommensurable scores.
  *
  * Reciprocal Rank Fusion (Cormack/Clarke/Buettcher, SIGIR'09):
  * score(d) = Σ_r 1/(c + rank_r(d)), c = 60 by default. Only RANKS
  * cross the fusion boundary — the one float division per list is
  * exact IEEE (integer numerator/denominator), and the two-term sum
  * is assembled in fixed list order, so the fused score is
  * bit-identical on any engine (no libm, no agg-order drift).
  *
  * Scale shape: real ranking lists are top-k bounded (each retriever
  * already truncated), so the fusion join runs over k-sized frames —
  * broadcast-joinable regardless of corpus size. Items missing from a
  * list contribute 0 (the standard RRF convention), via a full outer
  * join. */
object Retrieval {

  /** Fuse two ranked lists. Inputs carry (idCol, rankCol with 1-based
    * ranks); output: idCol, rank_a, rank_b (null where absent), rrf —
    * fused score, descending = better. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
      rankCol: String = "rank", c: Int = 60): DataFrame = {
    val l = a.select(col(idCol), col(rankCol).cast("long").as("rank_a"))
    val r = b.select(col(idCol), col(rankCol).cast("long").as("rank_b"))
    def term(rank: Column): Column =
      when(rank.isNull, lit(0.0)).otherwise(lit(1.0) / (lit(c) + rank))
    l.join(r, Seq(idCol), "full_outer")
      .withColumn("rrf", round(term(col("rank_a")) + term(col("rank_b")), 6))
  }

  /** Keyword retrieval: rank documents against a bag-of-terms query by
    * summed rational tf-idf — `Σ_t tf(d,t) · ⌊10⁶(N+1)/(df(t)+1)⌋`,
    * the libm-free idf surrogate the corpus-stats operators use (a
    * monotone transform of the classic idf ordering; integer
    * arithmetic end to end, so scores replay exactly anywhere).
    *
    * Scale shape: the query-term list broadcasts FIRST, so the only
    * corpus-sized stages are the tokenize-explode and one (doc, term)
    * aggregation already filtered to query terms; document frequencies
    * for those terms come from the filtered frame (dropping non-query
    * terms changes no query term's df). Nothing corpus-sized is
    * shuffled more than once, and the final top-k is a k-limit on a
    * query-terms-only frame. */
  def tfidfSearch(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "tfidfSearch: need at least one term")
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queryTerms.distinct.toDF("term")
    val toks = docs.select(col(idCol),
        explode(graft.functions.TextFns.tokens(lower(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
    val tfq = toks.join(broadcast(q), Seq("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tfq.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(n))
      .groupBy(col(idCol))
      .agg(sum(col("tf") * expr("(n_docs + 1) * 1000000L div (df + 1)"))
        .cast("long").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}

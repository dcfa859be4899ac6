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
}

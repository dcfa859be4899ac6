package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.VectorFns

/** Label aggregation + preference-pair construction — the two
  * annotation-side primitives of a supervised / preference-tuning data
  * pipeline. Crowd and model-ensemble labels arrive many-per-example
  * and must collapse to one consensus label with an agreement measure
  * (the quality dial for routing low-consensus examples back to
  * review); reward- or score-annotated responses must collapse to
  * (chosen, rejected) pairs with a margin gate (the DPO/RLHF pair
  * builder — tiny margins are label noise, not preference signal).
  *
  * Both ops are single keyed aggregates with map-side partial combine:
  * vote counting shrinks the stream to (example × label) rows before
  * the winner is picked, and pair selection never materializes the
  * per-example candidate list — `max_by`/`min_by` over a (score, id)
  * struct keep one running champion per partition, so a 100 TB
  * response log folds to one row per example in a single exchange with
  * no window sort. Tie-breaks ride the struct compare (score, then id)
  * and are therefore total and engine-replayable — an unordered
  * `arg_max` would be nondeterministic under ties.
  */
object Labels {

  /** Consensus label per `keyCol`: the `labelCol` value with the most
    * votes (each row = one vote, optionally weighted by `weight` —
    * annotator-reliability weighting), ties broken toward the SMALLEST
    * label so the winner is a pure function of the data. Emits
    * (key, label, votes, total_votes, agreement) with agreement =
    * round(votes/total, 6); weights go through exact decimal sums so
    * aggregation order can't drift the ratio.
    *
    * Plan: groupBy(key, label) counts votes (the big exchange, with
    * map-side combine), then a groupBy(key) `max_by` over the shrunken
    * vote table picks the winner — no window sort over raw votes.
    */
  def majorityVote(
      df: DataFrame,
      keyCol: String,
      labelCol: String,
      weight: Option[Column] = None): DataFrame = {
    val w = weight.getOrElse(lit(1)).cast(DecimalType(18, 6))
    // NULL-weight rows are dropped like NULL-label rows (a vote with
    // no weight is no vote): the decimal sum would silently skip them
    // anyway, and a (key, label) whose weights are ALL null would
    // yield votes=NULL — whose negated struct field sorts FIRST
    // ascending, letting a weightless label win the consensus
    // (ADVICE r9). The filter constant-folds away for the unweighted
    // default.
    val votes = df.where(col(labelCol).isNotNull && w.isNotNull)
      .groupBy(col(keyCol), col(labelCol))
      .agg(sum(w).as("votes"))
    // "votes DESC, label ASC" as a min over struct(−votes, label):
    // struct compare can't mix directions, and decimals negate exactly.
    votes
      .withColumn("__neg", col("votes") * lit(-1))
      .groupBy(col(keyCol))
      .agg(
        min_by(struct(col(labelCol).as("label"), col("votes")),
          struct(col("__neg"), col(labelCol))).as("__win"),
        sum(col("votes")).as("total_votes"))
      .select(col(keyCol), col("__win.label").as("label"),
        col("__win.votes").cast(DoubleType).as("votes"),
        col("total_votes").cast(DoubleType).as("total_votes"),
        round(col("__win.votes").cast(DoubleType) /
          col("total_votes").cast(DoubleType), 6).as("agreement"))
  }

  /** (chosen, rejected) pair per `keyCol` group: chosen = the row with
    * the highest `scoreCol` (ties → highest `idCol`), rejected = the
    * lowest (ties → lowest id), kept only when the two are different
    * rows AND the margin clears `minMargin` (a pair whose rewards are
    * indistinguishable teaches nothing and injects noise — the
    * standard DPO pair-filter). Emits (key, chosen_id, chosen_score,
    * rejected_id, rejected_score, margin) with margin rounded to 6 dp.
    *
    * One keyed aggregate: `max_by`/`min_by` over the (score, id)
    * struct fold each partition to a single champion row per key —
    * no per-key candidate list, no window sort.
    */
  def preferencePairs(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      scoreCol: String,
      minMargin: Double = 0.0): DataFrame = {
    val pick = struct(col(scoreCol).as("score"), col(idCol).as("id"))
    df.where(col(scoreCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(max(pick).as("__hi"), min(pick).as("__lo"),
        count(lit(1)).as("__n"))
      .where(col("__n") > 1 && col("__hi.id") =!= col("__lo.id"))
      .select(col(keyCol),
        col("__hi.id").as("chosen_id"),
        round(col("__hi.score"), 6).as("chosen_score"),
        col("__lo.id").as("rejected_id"),
        round(col("__lo.score"), 6).as("rejected_score"),
        round(col("__hi.score") - col("__lo.score"), 6).as("margin"))
      .where(col("margin") >= lit(minMargin))
  }

  /** Bradley-Terry strength ratings from pairwise outcomes (Hunter
    * 2004's MM iteration) — the preference-strength model behind
    * reward-data analysis: given (winner, loser) match rows, estimate
    * per-player strengths r with P(i beats j) = rᵢ/(rᵢ+rⱼ). Each MM
    * round computes rᵢ ← Wᵢ / Σⱼ nᵢⱼ/(rᵢ+rⱼ) from the previous round's
    * ratings; `iters` rounds are unrolled into the plan and the final
    * ratings are normalized by the max (BT is scale-free) and rounded.
    *
    * Determinism contract: each denominator TERM rounds to 6 dp and
    * the per-player sum runs in exact decimals, so the iteration — and
    * therefore the whole trajectory — is aggregation-order-independent
    * and replays in SQL as `iters` chained CTEs. Zero-win players
    * floor at 1e-6 instead of collapsing the next round's divisions.
    *
    * Scale shape: matches fold to (i, j, nᵢⱼ) and (player, wins) once
    * — both player-bounded — and every iteration joins the tiny
    * ratings frame back by broadcast; the corpus-sized match log is
    * never re-shuffled. */
  def bradleyTerry(
      matches: DataFrame,
      winnerCol: String,
      loserCol: String,
      iters: Int = 3,
      maxPlayers: Int = 100000,
      maxPairs: Int = 2000000): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters=$iters")
    val spark = matches.sparkSession
    import spark.implicits._
    val m = matches
      .select(col(winnerCol).cast("string").as("w"),
        col(loserCol).cast("string").as("l"))
      .where(col("w") =!= col("l") &&
        col("w").isNotNull && col("l").isNotNull)
    val wins = m.groupBy(col("w").as("player"))
      .agg(count(lit(1)).as("wins"))
    val losses = m.groupBy(col("l").as("player"))
      .agg(count(lit(1)).as("losses"))
    val players = wins.join(losses, Seq("player"), "full")
      .na.fill(0L, Seq("wins", "losses"))
    val pairs = m.groupBy(col("w").as("i"), col("l").as("j"))
      .agg(count(lit(1)).as("nij"))
    val sym = pairs
      .unionByName(pairs.select(col("j").as("i"), col("i").as("j"),
        col("nij")))
      .groupBy(col("i"), col("j")).agg(sum(col("nij")).as("n"))
    // The corpus-sized work ends here: the match log folded ONCE to
    // player-bounded (player, wins, losses) and (i, j, n) frames. The
    // MM rounds themselves run DRIVER-side over those bounded rows —
    // the CC-local-finish / BPE-argmax pattern: a distributed version
    // of 3 rounds × (two broadcasts + a 25-row aggregate) costs ~12
    // near-empty stages of pure scheduler latency (measured 3.1 s
    // wall at 7 cpu s). The arithmetic mirrors the SQL oracle
    // operation for operation: HALF_UP 6-dp rounds, exact BigDecimal
    // term sums, the same double division chain.
    // limit bounds the COLLECT itself (maxPlayers+1 rows max, like the
    // sym collect below); the require turns the overflow into the error
    val p = players.limit(maxPlayers + 1).as[(String, Long, Long)].collect()
    require(p.length <= maxPlayers,
      s"bradleyTerry: ${p.length} players exceed maxPlayers=$maxPlayers")
    if (p.isEmpty)
      return Seq.empty[(String, Long, Long, Double)]
        .toDF("player", "wins", "losses", "rating")
    // maxPlayers alone does not bound the pair table — distinct pairs
    // grow as players², which at the default cap is ~10¹⁰ rows, a
    // driver OOM long before any guard fires (ADVICE r9). The limit
    // bounds the COLLECT itself (maxPairs+1 rows max), and the
    // require turns an over-dense match graph into a loud error with
    // the dial to raise.
    val s = sym.limit(maxPairs + 1).as[(String, String, Long)].collect()
    require(s.length <= maxPairs,
      s"bradleyTerry: over $maxPairs distinct (winner, loser) pairs — " +
        "raise maxPairs or pre-aggregate the match log")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var r = p.map { case (pl, _, _) => pl -> 1.0 }.toMap
    for (_ <- 1 to iters) {
      val den = s.groupBy(_._1).map { case (pl, terms) =>
        pl -> terms.map { case (_, j, n) =>
          BigDecimal(r6(n.toDouble / (r(pl) + r(j)))) }.sum
      }
      r = p.map { case (pl, w, _) =>
        pl -> den.get(pl).fold(1e-6)(d =>
          math.max(r6(w.toDouble / d.toDouble), 1e-6))
      }.toMap
    }
    val rmax = r.values.max
    p.map { case (pl, w, l) => (pl, w, l, r6(r(pl) / rmax)) }
      .toSeq
      .toDF("player", "wins", "losses", "rating")
  }

  /** Label propagation over an LSH-bucketed kNN graph (Zhu & Ghahramani
    * 2002's iterative scheme, hard labels) — the semi-supervised
    * labeler: a small seeded fraction carries ground-truth labels, and
    * each round every unlabeled node takes the majority label of its k
    * nearest neighbors (ties toward the smallest label; seeds are
    * clamped and never change). `rounds` rounds are unrolled into the
    * plan.
    *
    * Graph construction never goes all-pairs: nodes bucket by
    * [[VectorFns.signBucket]] sign bits (map-side), degenerate buckets
    * are capped ([[Guards.capBuckets]] — same skew guard as SemDeDup;
    * capped-out nodes keep their seed or stay unlabeled), and the
    * within-bucket self-join + per-node top-k window is Σ bucket²
    * work. Each vote round is one edge⋈label equi-join + a keyed count
    * aggregate; the winner comes from the SHRUNK (node × label) vote
    * table via `min_by` over (−votes, label) — total tie-break, no
    * window over raw votes (the [[majorityVote]] shape). */
  def labelPropagate(
      nodes: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      seedPred: Column,
      k: Int = 5,
      nBits: Int = 8,
      rounds: Int = 2,
      maxBucket: Int = 2000): DataFrame = {
    require(rounds >= 1 && rounds <= 10, s"rounds=$rounds")
    val base = nodes.select(col(idCol).as("id"), col(vecCol).as("v"),
      when(seedPred, col(labelCol)).otherwise(lit(null)).as("seed"))
    val capped = Guards.capBuckets(
      base.withColumn("bucket", VectorFns.signBucket(col("v"), nBits)),
      Seq("bucket"), maxBucket)
    val a = capped.select(col("id").as("src"), col("v").as("av"),
      col("bucket"))
    val c = capped.select(col("id").as("dst"), col("v").as("cv"),
      col("bucket"))
    val edges = a.join(c, Seq("bucket"))
      .filter(col("src") =!= col("dst"))
      .withColumn("sim",
        round(VectorFns.cosineFast(col("av"), col("cv")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("sim").desc, col("dst"))))
      .filter(col("rn") <= k)
      .select("src", "dst")
      // the edge build (bucket self-join + top-k window) is the op's
      // dominant cost and every vote round consumes it — pin it once
      .localCheckpoint(false)
    var lab = base.select(col("id"), col("seed").as("label"))
    for (_ <- 1 to rounds) {
      val votes = edges
        .join(lab.select(col("id").as("dst"), col("label")), Seq("dst"))
        .where(col("label").isNotNull)
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("n"))
      val win = votes
        .withColumn("__neg", -col("n"))
        .groupBy(col("src"))
        .agg(min_by(col("label"), struct(col("__neg"), col("label")))
          .as("vlabel"))
        .withColumnRenamed("src", "id")
      lab = base.select(col("id"), col("seed"))
        .join(win, Seq("id"), "left")
        .select(col("id"), coalesce(col("seed"), col("vlabel")).as("label"))
    }
    base.select(col("id"), col("seed").isNotNull.as("is_seed"))
      .join(lab, Seq("id"))
      .select(col("id"), col("is_seed"), col("label"))
  }
}

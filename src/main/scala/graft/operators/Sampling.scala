package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-reproducible sampling — the pipeline-stable
  * alternative to `df.sample()` for training-data work. `sample()`'s
  * seeded RNG is tied to partition layout: add one input file, or let
  * AQE re-split the scan, and a "seeded" sample silently changes
  * membership. Keying the decision on a content hash makes the sample
  * a pure function of the DATA — stable across runs, partitionings,
  * engines (DuckDB replays it verbatim), and incremental reloads
  * (yesterday's rows keep yesterday's verdict, the property that makes
  * held-out eval sets trustworthy).
  *
  * Mechanism: keep a row iff the first 12 hex chars of
  * md5(seed ‖ key) — a uniform 48-bit value rendered in lowercase hex,
  * where lexicographic order equals numeric order — fall below
  * fraction·16¹². Pure map-side column algebra: no shuffle, no state,
  * trivially pushes through scans, and composes with any downstream
  * operator.
  */
object Sampling {

  /** 12-hex-char threshold for a fraction of the 48-bit hash space.
    * Only meaningful for cuts inside the space — a cut at 2^48 would
    * render 13 hex chars and break the lexicographic compare, so the
    * degenerate fractions are handled as constant predicates in
    * [[hashKeep]]. */
  private[graft] def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction")
    f"${math.round(fraction * (1L << 48))}%012x"
  }

  /** Null-key guard shared by every hash-keyed membership op (r12
    * review fix): md5(seed ‖ NULL) is NULL, so a null key silently
    * fell out of BOTH split sides / every fold / the sample — data
    * loss, not an assignment. Hash-keyed membership must be a TOTAL
    * function of the data, so a null key is a caller bug surfaced
    * loudly at execution (coalesce or filter null keys first) — the
    * aucRankSum domain-guard convention. */
  private def keyOrFail(key: Column, op: String): Column = {
    val s = key.cast("string")
    when(s.isNull, raise_error(lit(s"$op: NULL key — hash-keyed " +
      "membership would silently drop or misassign the row; coalesce " +
      "or filter null keys first"))).otherwise(s)
  }

  /** The sampling predicate itself, exposed for reuse in SQL/oracles. */
  def hashKeep(key: Column, fraction: Double, seed: String = ""): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction")
    val cut = math.round(fraction * (1L << 48))
    if (cut <= 0L) lit(false)
    else if (cut >= (1L << 48)) lit(true)
    else substring(md5(concat(lit(seed), keyOrFail(key, "hashKeep"))), 1, 12) <
      lit(thresholdHex(fraction))
  }

  /** Bernoulli sample at `fraction` keyed on md5(seed ‖ key). Rows with
    * equal keys always land on the same side — dedup-consistent when
    * keyed on a business id. */
  def sampleByHash(df: DataFrame, key: Column, fraction: Double,
      seed: String = ""): DataFrame =
    df.where(hashKeep(key, fraction, seed))

  /** Disjoint deterministic split (e.g. train/test): rows below the
    * `leftFraction` cut go left, everything else right — membership is
    * again a pure function of the key, so the split survives reloads. */
  def splitByHash(df: DataFrame, key: Column, leftFraction: Double,
      seed: String = ""): (DataFrame, DataFrame) = {
    val keep = hashKeep(key, leftFraction, seed)
    (df.where(keep), df.where(!keep))
  }

  /** Threshold string usable in a per-row compare even at the
    * degenerate fractions: "" admits nothing (no string < ""), "g"
    * admits every 12-hex-char hash ('g' > 'f'). */
  private def thresholdHexClamped(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction")
    val cut = math.round(fraction * (1L << 48))
    if (cut <= 0L) "" else if (cut >= (1L << 48)) "g" else f"$cut%012x"
  }

  /** Weighted (importance) sampling predicate: each row carries its OWN
    * keep probability — the quality-proportional curation shape ("keep
    * good documents more often") with the same data-keyed determinism
    * as [[hashKeep]]. The per-row cut renders as 12 lowercase hex chars
    * via integer arithmetic (floor(frac·2⁴⁸) — the ·2⁴⁸ is a power-of-
    * two exponent shift, exact in IEEE — then a zero-padded hex
    * format), so the whole predicate replays in SQL
    * (`printf('%012x', ...)` in DuckDB). Fractions ≥ 1 keep the row
    * outright; fractions ≤ 0 (and null) drop it. Map-side only. */
  def hashKeepWeighted(key: Column, fraction: Column,
      seed: String = ""): Column = {
    val cut = floor(fraction * lit((1L << 48).toDouble)).cast("long")
    val cutHex = lpad(lower(hex(cut)), 12, "0")
    (fraction >= lit(1.0)) ||
      (fraction > lit(0.0) &&
        substring(md5(concat(lit(seed),
          keyOrFail(key, "hashKeepWeighted"))), 1, 12) < cutHex)
  }

  /** Deterministic k-fold assignment: fold(row) ∈ [0, k) by which of k
    * equal slices of the 48-bit hash space md5(seed ‖ key) lands in —
    * the cross-validation / sharded-eval shape. Same CASE-over-hex-cuts
    * construction as [[sampleStratified]], so the whole assignment is a
    * map-side predicate chain that replays in SQL, and — like every
    * hash-keyed op here — membership is a pure function of the data:
    * key on the USER and no entity straddles a fold boundary. Folds
    * compose with [[hashKeep]]'s thresholds (same space, same order):
    * fold 0 at k=5 is exactly the 20 % sample hashKeep(0.2) admits. */
  def foldId(key: Column, k: Int, seed: String = ""): Column = {
    require(k >= 2 && k <= 4096, s"foldId: need 2 <= k <= 4096, got $k")
    val h = substring(md5(concat(lit(seed), keyOrFail(key, "foldId"))), 1, 12)
    val cuts = (1 until k).map(i => thresholdHexClamped(i.toDouble / k))
    cuts.zipWithIndex.reverse.foldLeft(lit(k - 1): Column) {
      case (acc, (cut, i)) => when(h < lit(cut), lit(i)).otherwise(acc)
    }
  }

  /** The fold-boundary hex cuts, exposed so oracles/SQL render the
    * exact same CASE chain. */
  private[graft] def foldCuts(k: Int): Seq[String] =
    (1 until k).map(i => thresholdHexClamped(i.toDouble / k))

  /** Per-row-probability Bernoulli sample over [[hashKeepWeighted]]. */
  def sampleWeighted(df: DataFrame, key: Column, fraction: Column,
      seed: String = ""): DataFrame =
    df.where(hashKeepWeighted(key, fraction, seed))

  /** Class-balanced deterministic downsample: every stratum is cut to
    * the size of the SMALLEST stratum, keeping the rows with the
    * lowest md5(seed ‖ key) — the rebalance step before training on a
    * skewed label distribution, with the same data-keyed stability as
    * [[sampleByHash]] (membership is a pure function of the data, so
    * reloads and engine swaps keep the same rows).
    *
    * Shape: one count aggregate (strata-sized, broadcast back) + one
    * stratum-partitioned row_number — the window parallelizes across
    * strata; no stratum's data crosses to another.
    *
    * OUTPUT: the input columns PLUS `rn` (the within-stratum hash
    * rank, 1-based — the q_class_balance caller consumes it); an
    * existing `rn` column on the input is overwritten. */
  def balanceByHash(df: DataFrame, stratum: Column, key: Column,
      seed: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val target = df.groupBy(stratum.as("_s")).agg(count(lit(1)).as("_n"))
      .agg(min(col("_n")).as("_target"))
    val w = Window.partitionBy(stratum)
      .orderBy(md5(concat(lit(seed), keyOrFail(key, "balanceByHash"))), key)
    df.withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(target))
      .where(col("rn") <= col("_target"))
      .drop("_target")
  }

  /** Per-stratum deterministic sampling: each stratum keeps its own
    * fraction (downsample the boilerplate-heavy domain, keep the rare
    * language whole) with the same data-keyed stability as
    * [[sampleByHash]]. The per-row threshold is a CASE chain over
    * literal hex cuts — pure map-side column algebra, no join, no
    * shuffle, and the whole predicate replays in SQL. */
  def sampleStratified(df: DataFrame, key: Column, stratum: Column,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      seed: String = ""): DataFrame = {
    val cut = fractions.foldLeft(lit(thresholdHexClamped(defaultFraction))) {
      case (acc, (s, f)) => when(stratum === lit(s),
        lit(thresholdHexClamped(f))).otherwise(acc)
    }
    df.where(
      substring(md5(concat(lit(seed),
        keyOrFail(key, "sampleStratified"))), 1, 12) < cut)
  }

  /** Rendezvous (highest-random-weight) shard assignment: a key lands
    * on the shard whose md5(shard:key) is LARGEST — the consistent-
    * placement scheme whose removal property `foldId` lacks: deleting
    * a shard moves ONLY that shard's keys (each survivor's winning
    * hash is unchanged), where a mod-N scheme reshuffles nearly
    * everything. Map-side: one md5 per (key, shard) against a
    * compile-time shard list, a CASE chain picks the argmax (ties —
    * md5 collisions — break toward the smaller shard id). Replays in
    * SQL as the same hash columns + CASE. */
  def rendezvousShard(key: Column, nShards: Int, seed: String = ""): Column = {
    require(nShards >= 1 && nShards <= 64, s"nShards=$nShards")
    val hs = (0 until nShards).map(i =>
      md5(concat(lit(s"$seed$i:"), keyOrFail(key, "rendezvousShard"))))
    (0 until nShards).foldRight(lit(nShards - 1): Column) { (i, acc) =>
      if (i == nShards - 1) acc
      else when((i until nShards).drop(1).map(j => hs(i) >= hs(j))
        .reduce(_ && _), lit(i)).otherwise(acc)
    }
  }

  /** Near-dup-aware train/eval split: [[splitByHash]] keyed on the
    * NEAR-DUP CLUSTER instead of the document, so a document and its
    * near-copies can never straddle the split boundary (the leak
    * doc-keyed splitting silently permits — an eval doc whose
    * near-twin sits in train is contamination, not generalization).
    * `pairs` is any near-dup pair frame (MinHash, SimHash, winnowing,
    * semantic); clusters come from the large/small-star connected
    * components, unpaired docs key on their own id via coalesce.
    * Membership stays a pure function of the data: same pairs, same
    * split, any engine, any partitioning.
    *
    * One CC run over the PAIR set (pair-sized, not corpus-sized) + one
    * left join of the corpus against the cluster map + the map-side
    * hash predicate. Emits the input rows plus (split_key, split). */
  def splitDedupAware(
      df: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      leftFraction: Double, seed: String = ""): DataFrame = {
    val cc = ConnectedComponents.connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("id", "__ccid")
    df.join(cc, col(idCol) === col("__ccid"), "left")
      .withColumn("split_key", coalesce(col("component"), col(idCol)))
      .withColumn("split",
        when(hashKeep(col("split_key"), leftFraction, seed), lit("train"))
          .otherwise(lit("eval")))
      .drop("__ccid", "component")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.plans.{MinHashBands, SimHash64}

/** Deduplication operators for a pretraining-data pipeline: exact,
  * fingerprint, MinHash+LSH, SimHash, n-gram Jaccard. All are
  * shuffle-once designs — a groupBy on a deterministic key, or an
  * equi-join on LSH buckets — with no pairwise quadratic stage outside
  * a bucket, which is what keeps them viable at 100 TB.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical text. One hash
    * aggregation on the text (Spark hashes the key for the exchange —
    * long texts ride the shuffle once; use [[byFingerprint]] to shuffle
    * a 32-byte key instead at scale). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Near-exact dedup on the md5 fingerprint of whitespace-normalized,
    * lowercased text — the key is 32 bytes regardless of doc size, so
    * the exchange stays small. */
  def byFingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("fp", TextFns.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles of the text (the unit of Jaccard/MinHash). */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextFns.tokens(lower(text))
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** MinHash + LSH banding near-dup candidates, verified by exact
    * Jaccard. `bands` × `rows` hash functions; docs sharing any band
    * bucket are candidates; candidates are then verified with exact
    * shingle Jaccard ≥ `threshold`.
    *
    * Plan shape: map-side [[graft.plans.MinHashBands]] (one fused pass:
    * each shingle hashed once, k derived mins, band buckets) →
    * posexplode(bands) → shuffle on (band, bucket) — the only exchange
    * proportional to corpus size — → within-bucket self-join (buckets
    * are tiny by construction) → verification join back to shingle
    * sets.
    */
  def minhashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, bands: Int = 4, rows: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    // Banded rows carry only (id, band, bucket) — the shingle arrays
    // stay out of the ×bands-duplicated exchange and are joined back
    // exactly once for the verify stage.
    val banded = df
      .select(col(idCol).as("id"),
        posexplode(MinHashBands.column(
          shingles(col(textCol), shingleN), bands, rows)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val l = banded.as("l"); val r = banded.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    ngramJaccard(candidates, df, textCol, idCol, shingleN)
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup candidates: 64-bit fingerprint (native
    * expression), bucketed by 16-bit bands (any-band-equal ⇒ hamming ≤
    * 3 pairs are guaranteed candidates), verified by exact hamming
    * distance. */
  def simhashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"),
      SimHash64.column(TextFns.tokens(lower(col(textCol)))).as("fp"))
    val banded = fp.select(col("id"), col("fp"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("fp"), b * 16).bitwiseAND(lit(0xffffL)).as("bucket"))
      }: _*)).as("bb"))
      .select(col("id"), col("fp"), col("bb.band"), col("bb.bucket"))
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r,
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        SimHash64.hamming(col("l.fp"), col("r.fp")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact token-n-gram Jaccard similarity for given candidate pairs
    * (two-sided join to fetch shingle sets; used standalone for small
    * candidate lists or as the verify stage of the LSH paths). */
  def ngramJaccard(
      pairs: DataFrame, docs: DataFrame,
      textCol: String, idCol: String, n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .drop("sh_a", "sh_b")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary training — the classic
  * word-level BPE (Sennrich et al., ACL'16): start from characters,
  * repeatedly merge the most frequent adjacent symbol pair.
  *
  * Scale shape: the ONLY corpus-sized stage is the word-count
  * aggregation (one tokenize-explode + one shuffle on the word). Every
  * training iteration then runs over the DISTINCT-WORD vocabulary —
  * bounded by vocabulary size, not corpus size, which is what makes
  * BPE trainable on a 100 TB corpus: a trillion tokens still collapse
  * to a few million distinct words, and the per-iteration pair count
  * is an explode over that small frame. The chosen pair is never
  * collected to the driver — each round's argmax row is broadcast back
  * and applied declaratively, and per-round `localCheckpoint`
  * truncates the growing lineage (the PageRank fixed-point pattern).
  *
  * Determinism: symbol sequences are represented as `<a><b><c>`
  * strings. Delimiters cannot occur inside symbols (words are
  * restricted to `[a-z0-9]+`), so a plain left-to-right
  * all-occurrences `replace` of `<a><b>` with `<ab>` is exactly the
  * greedy merge order reference BPE uses, with identical semantics in
  * any engine's `replace`. Argmax ties break on the lexicographically
  * smallest pair string.
  */
object Bpe {

  /** Corpus → (word, c, seq): whitespace-tokenized lowercase words
    * restricted to `[a-z0-9]+`, their corpus counts, and the initial
    * per-character symbol sequence (`"ab1"` → `"<a><b><1>"`). */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.TextFns.tokens(lower(col(textCol))))
        .as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .withColumn("seq", regexp_replace(col("word"), "(.)", "<$1>"))

  /** Adjacent symbol pairs of a `<..><..>` sequence, each formatted as
    * the search string its merge would use (`"<a><b>"`). */
  private def pairsOf(seq: Column): Column = {
    val syms = split(expr("substring(seq, 2, length(seq) - 2)"), "><")
    when(size(syms) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(syms) - 1),
        i => concat(lit("<"), element_at(syms, i),
          lit("><"), element_at(syms, i + 1), lit(">"))))
  }

  /** The zero-merge contract schema, shared by both trainers (an empty
    * [[train]] table carries (step, find, repl, cnt); [[trainBatched]]
    * adds the within-round `rnk`). */
  private def emptyMergeTable(like: DataFrame, withRnk: Boolean): DataFrame = {
    import org.apache.spark.sql.types._
    val fields =
      Seq(StructField("step", IntegerType, nullable = false)) ++
        (if (withRnk) Seq(StructField("rnk", IntegerType, nullable = false))
         else Nil) ++
        Seq(StructField("find", StringType), StructField("repl", StringType),
          StructField("cnt", LongType))
    like.sparkSession.createDataFrame(
      like.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(fields))
  }

  /** Train `iters` merges over a [[wordVocab]] frame. Returns one row
    * per merge: (step, find, repl, cnt) — e.g. step 1 merging `t`+`h`
    * is (`1`, `"<t><h>"`, `"<th>"`, total weighted count). */
  def train(vocab0: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "train: need at least one merge step")
    var vocab = vocab0
    val merges = Seq.newBuilder[DataFrame]
    var step = 1
    var exhausted = false
    while (step <= iters && !exhausted) {
      val counts = vocab
        .select(col("c"), explode(pairsOf(col("seq"))).as("find"))
        .groupBy(col("find")).agg(sum(col("c")).as("cnt"))
      val top1 = counts.orderBy(col("cnt").desc, col("find")).limit(1)
        .withColumn("repl",
          concat(lit("<"), translate(col("find"), "<>", ""), lit(">")))
        .localCheckpoint(false)
      // pair exhaustion before `iters` ends training: top1 is already
      // checkpointed, so the emptiness probe is nearly free, and it
      // saves the remaining rounds' explode/agg/sort jobs (review r7).
      // The LEFT join on true (not a cross join) is the correctness
      // backstop for the same case: an empty argmax carries the vocab
      // through unchanged instead of wiping it to zero rows.
      if (top1.isEmpty) exhausted = true
      else {
        vocab = vocab
          .join(broadcast(top1.select(col("find"), col("repl"))), lit(true), "left")
          .withColumn("seq", when(col("find").isNotNull,
            expr("replace(seq, find, repl)")).otherwise(col("seq")))
          .drop("find", "repl")
          .localCheckpoint(false)
        merges += top1.select(
          lit(step).as("step"), col("find"), col("repl"), col("cnt"))
      }
      step += 1
    }
    val built = merges.result()
    // a corpus of only 1-char words trains zero merges — return the
    // empty merge table with the contract schema, not a crash
    if (built.isEmpty) emptyMergeTable(vocab0, withRnk = false)
    else built.reduce(_.unionByName(_))
  }

  /** Batched BPE training: per round, merge up to `batch` of the
    * top-ranked pairs instead of one — the production answer to
    * [[train]]'s one-round-per-merge shape, which needs 30k sequential
    * Spark jobs for a 30k vocabulary. Batching cuts the round count by
    * ~`batch`× at a bounded, well-understood divergence from
    * sequential BPE (SentencePiece and other production trainers make
    * the same trade).
    *
    * Batch selection must be ORDER-INDEPENDENT inside a round, or the
    * result is undefined: two merges sharing a symbol interact (one
    * can create or destroy the other's occurrences). The rule here —
    * rank all pairs by (cnt DESC, find), keep a candidate only if it
    * shares NO symbol with ANY higher-ranked candidate, take the first
    * `batch` kept — guarantees the kept set is pairwise
    * symbol-disjoint, and for disjoint pairs a merge can neither
    * create nor destroy another's adjacencies (symbols live in
    * delimiter-bounded `<..>` cells), so applying them in any order
    * yields the same vocab and their pre-round counts are exact.
    * Divergence from sequential BPE happens only when a merge's NEWLY
    * CREATED symbol would have out-ranked a later pick — the batched ≡
    * sequential spec pins the equality on corpora where it doesn't.
    *
    * The rule is deliberately a join (conflict against any
    * higher-RANKED candidate, not any higher-ranked KEPT one — a
    * greedy fold would be sequential again): one self-anti-join over
    * the `candidates`-row frame, SQL-replayable by the DuckDB oracle.
    * Scale shape matches [[train]]: pair counting is vocab-bounded,
    * candidate ranking is a distributed top-`candidates`
    * (TakeOrderedAndProject), the conflict join runs over ≤`candidates`
    * rows, and the chosen merges are broadcast back as one array — the
    * driver never holds them.
    *
    * Returns one row per merge: (step, rnk, find, repl, cnt) — step is
    * the round number. */
  def trainBatched(
      vocab0: DataFrame,
      rounds: Int,
      batch: Int,
      candidates: Int): DataFrame = {
    require(rounds >= 1, "trainBatched: need at least one round")
    require(batch >= 1, "trainBatched: need batch >= 1")
    require(candidates >= batch, "trainBatched: candidates must cover batch")
    import org.apache.spark.sql.expressions.Window
    var vocab = vocab0
    val merges = Seq.newBuilder[DataFrame]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val counts = vocab
        .select(col("c"), explode(pairsOf(col("seq"))).as("find"))
        .groupBy(col("find")).agg(sum(col("c")).as("cnt"))
      // top-`candidates` distributed, THEN the (bounded) rank window
      val cand = counts.orderBy(col("cnt").desc, col("find")).limit(candidates)
        .withColumn("rn",
          row_number().over(Window.orderBy(col("cnt").desc, col("find"))))
        .withColumn("ls", regexp_extract(col("find"), "^<([^>]*)><", 1))
        .withColumn("rs", regexp_extract(col("find"), "><([^>]*)>$", 1))
        .localCheckpoint(false) // self-joined below; pin one evaluation
      val kept = cand.as("a").join(cand.as("b"),
          col("b.rn") < col("a.rn") &&
            (col("b.ls") === col("a.ls") || col("b.ls") === col("a.rs") ||
             col("b.rs") === col("a.ls") || col("b.rs") === col("a.rs")),
          "left_anti")
        .withColumn("rnk", row_number().over(Window.orderBy(col("rn"))))
        .filter(col("rnk") <= batch)
        .withColumn("repl",
          concat(lit("<"), translate(col("find"), "<>", ""), lit(">")))
        .localCheckpoint(false)
      if (kept.isEmpty) exhausted = true
      else {
        // all chosen merges ride ONE broadcast array; disjointness makes
        // the fold order irrelevant, rnk order keeps it deterministic
        val mergeArr = kept.agg(array_sort(
          collect_list(struct(col("rnk"), col("find"), col("repl")))).as("__ms"))
        vocab = vocab
          .join(broadcast(mergeArr), lit(true), "left")
          .withColumn("seq",
            expr("aggregate(__ms, seq, (acc, m) -> replace(acc, m.find, m.repl))"))
          .drop("__ms")
          .localCheckpoint(false)
        merges += kept.select(lit(round).as("step"), col("rnk"),
          col("find"), col("repl"), col("cnt"))
      }
      round += 1
    }
    val built = merges.result()
    if (built.isEmpty) emptyMergeTable(vocab0, withRnk = true)
    else built.reduce(_.unionByName(_))
  }

  /** Segment the vocab with the trained merges: the final (word, seq)
    * after all `iters` rounds — what a tokenizer would persist. */
  def segmented(vocab0: DataFrame, merges: DataFrame): DataFrame = {
    val rules = merges.orderBy(col("step"))
      .select(col("find"), col("repl")).collect() // bounded: ≤ iters merge rules (vocab dial)
    rules.foldLeft(vocab0) { (v, r) =>
      v.withColumn("seq",
        expr(s"replace(seq, '${r.getString(0)}', '${r.getString(1)}')"))
    }
  }
}

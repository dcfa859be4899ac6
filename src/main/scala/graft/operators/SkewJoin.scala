package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join (SURVEY.md §2.B joins; the "salting for
  * skew" scale tool the 100 TB brief calls for).
  *
  * A shuffle join partitions both sides by the key: one hot key (a
  * null-ish default id, a boilerplate document, a mega-customer) lands
  * ALL its rows in one task and the stage runs at the speed of that
  * straggler. Salting splits the hot key's rows across `salts` tasks:
  * the big side gets a deterministic salt in [0, salts), the small
  * side is replicated once per salt value, and the join key becomes
  * (key, salt). Output is row-for-row identical to the plain join —
  * the salt only changes the partitioning.
  *
  * Cost model: small side × `salts` extra rows through the exchange;
  * worth it when the biggest key's row count ≫ rows/task. AQE's
  * skew-join handles sort-merge cases adaptively at runtime
  * (spark.sql.adaptive.skewJoin.*); this operator is the explicit,
  * planner-independent form that also covers hash joins and lets the
  * caller pick the fan-out.
  */
object SkewJoin {

  private val supported =
    Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")

  /** Join `big` (skewed side) with `small` on `key`, spreading each
    * big-side row into one of `salts` sub-partitions. Left-ish join
    * types only: each big row carries exactly one salt, so its
    * multiplicity is preserved; right/full would duplicate unmatched
    * small rows across replicas. */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(supported.contains(joinType.toLowerCase),
      s"saltedJoin supports left-ish joins only, got '$joinType'")
    // deterministic salt: hash of the whole row → same data, same plan
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}

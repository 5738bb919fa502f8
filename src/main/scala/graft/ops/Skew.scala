package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (100 TB posture). AQE's skew-join
  * splitting handles most cases at runtime; explicit salting is the
  * deterministic fallback when one build-side key dominates (e.g. a
  * single customer owning 1% of all orders) or when AQE is unavailable
  * (some streaming plans).
  */
object Skew {

  /** Salted equi-join: the skewed (probe) side gets a random-but-
    * deterministic salt in [0, salts); the small (build) side is
    * replicated once per salt value. Key cardinality seen by the
    * shuffle becomes |keys| * salts, splitting each hot key's rows
    * across `salts` reducers. Result set is identical to a plain join.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    // salt derived from a stable row fingerprint, not rand(): keeps the
    // operator deterministic (re-runs and retries produce identical
    // partitioning, which retry semantics at scale want anyway)
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.toIndexedSeq.map(col): _*)), lit(salts)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    val out = salted.join(replicated,
      salted(key) === replicated(key) && salted("__salt") === replicated("__salt"),
      joinType)
    out.drop("__salt").drop(replicated(key))
  }
}

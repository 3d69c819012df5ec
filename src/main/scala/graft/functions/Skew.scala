package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted broadcast-free joins for hot keys.
  *
  * When one join key dominates (a handful of keys carry most fact rows),
  * a plain shuffled join sends every hot-key row to one reducer. Salting
  * splits each key into `salt` sub-keys: the big side picks a
  * deterministic salt per row, the small side is replicated `salt` times,
  * and the join runs on (key, salt) — hot keys fan out over `salt`
  * reducers. AQE's skew-join handles post-shuffle splits automatically;
  * salting is the explicit pre-shuffle variant for extreme skew.
  */
object Skew {

  /** Inner equi-join of `big ⋈ small` on `keys`, salted `salt` ways.
    * `bigRowId` must be any deterministic per-row expression on the big
    * side (e.g. a unique id column) — it only seeds the salt choice.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salt: Int,
      bigRowId: Column): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(hash(bigRowId), lit(salt)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedSmall, keys :+ "_salt").drop("_salt")
  }
}

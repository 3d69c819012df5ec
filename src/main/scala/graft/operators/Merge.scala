package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delta-style `MERGE INTO` as pure DataFrame algebra: ordered
  * WHEN MATCHED (update / delete) and WHEN NOT MATCHED (insert) clauses
  * with optional conditions, first-match-wins like Delta/ANSI MERGE.
  * (Standard key-level merge — distinct from [[graft.state.StateTable]]'s
  * upsert, which replicates the reference's row-level duplicate-key
  * semantics, SURVEY.md §2.4.)
  *
  * The result is a new DataFrame — compose with `StateTable.overwrite`
  * for the atomic-swap commit.
  *
  * Scale: the source (batch side) is materialized once, then ONE
  * full-outer join on the merge keys plus per-row case expressions —
  * no driver-side rows; the ambiguity check re-reads the materialized
  * source, never recomputes it. The join broadcasts or
  * shuffle-hash-joins exactly as Catalyst decides from the two sides'
  * sizes.
  *
  * Clause conditions and update expressions reference the two sides as
  * `t.<col>` (target) and `s.<col>` (source), e.g.
  * `Merge.into(state, batch).on("id")
  *   .whenMatchedUpdate(Some(expr("s.ts > t.ts")))
  *   .whenMatchedDelete(Some(expr("s.tombstone")))
  *   .whenNotMatchedInsert()
  *   .execute()`
  */
object Merge {

  private sealed trait Clause { def cond: Option[Column] }
  private final case class Update(cond: Option[Column], set: Map[String, Column]) extends Clause
  private final case class Delete(cond: Option[Column]) extends Clause
  private final case class Insert(cond: Option[Column]) extends Clause

  def into(target: DataFrame, source: DataFrame): OnStep = new OnStep(target, source)

  final class OnStep private[Merge] (target: DataFrame, source: DataFrame) {
    def on(keys: String*): Builder = new Builder(target, source, keys.toSeq, Vector.empty, Vector.empty)
  }

  final class Builder private[Merge] (
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      matched: Vector[Clause],
      notMatched: Vector[Insert]) {

    /** Update every target column that the source also carries (updateAll
      * on the shared columns; target-only columns keep their values).
      */
    def whenMatchedUpdate(cond: Option[Column] = None): Builder = {
      val set = target.columns.filterNot(keys.contains)
        .filter(source.columns.contains)
        .map(c => c -> col(s"s.$c")).toMap
      whenMatchedUpdate(cond, set)
    }

    /** Update specific columns with arbitrary t./s. expressions. */
    def whenMatchedUpdate(cond: Option[Column], set: Map[String, Column]): Builder =
      new Builder(target, source, keys, matched :+ Update(cond, set), notMatched)

    def whenMatchedDelete(cond: Option[Column] = None): Builder =
      new Builder(target, source, keys, matched :+ Delete(cond), notMatched)

    def whenNotMatchedInsert(cond: Option[Column] = None): Builder =
      new Builder(target, source, keys, matched, notMatched :+ Insert(cond))

    /** @throws IllegalStateException when several source rows match one
      *         key (ambiguous merge, same contract as Delta's
      *         "multiple source rows matched")
      */
    def execute(): DataFrame = {
      val reserved = Seq("_t", "_s", "_action")
      val clash = (target.columns ++ source.columns).filter(reserved.contains)
      if (clash.nonEmpty)
        throw new IllegalArgumentException(
          s"column name(s) ${clash.distinct.mkString(", ")} are reserved by Merge")

      // Materialize the source ONCE so the ambiguity check below and the
      // join read the same rows — a non-deterministic or recomputed
      // source (sample(), rand-derived) could otherwise pass the check
      // yet deliver duplicate keys to the join.
      val src = source.localCheckpoint()
      val dupKeys = src.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
      if (!dupKeys.isEmpty)
        throw new IllegalStateException(
          s"merge source has duplicate keys on (${keys.mkString(", ")}); " +
            "deduplicate (e.g. last-write-wins) before merging")

      val t = target.withColumn("_t", lit(true)).alias("t")
      val s = src.withColumn("_s", lit(true)).alias("s")
      val joined = t.join(s, keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _), "full_outer")
      val isMatched = col("_t").isNotNull && col("_s").isNotNull
      val targetOnly = col("_t").isNotNull && col("_s").isNull
      val sourceOnly = col("_t").isNull && col("_s").isNotNull

      // first-match-wins clause index; -1 = no clause applies
      val matchedIdx = matched.zipWithIndex.foldRight(lit(-1): Column) {
        case ((cl, i), rest) => when(cl.cond.getOrElse(lit(true)), lit(i)).otherwise(rest)
      }
      val insertIdx = notMatched.zipWithIndex.foldRight(lit(-1): Column) {
        case ((cl, i), rest) => when(cl.cond.getOrElse(lit(true)), lit(i)).otherwise(rest)
      }
      val action = when(targetOnly, lit("keep"))
        .when(isMatched, when(matchedIdx >= 0, concat(lit("m"), matchedIdx.cast("string"))).otherwise(lit("keep")))
        .when(sourceOnly, when(insertIdx >= 0, lit("insert")).otherwise(lit("drop")))

      val outCols = target.columns.filterNot(_ == "_t").map { c =>
        val base = if (keys.contains(c)) coalesce(col(s"t.$c"), col(s"s.$c")) else col(s"t.$c")
        val updated = matched.zipWithIndex.foldLeft(base) {
          case (acc, (Update(_, set), i)) if set.contains(c) =>
            when(col("_action") === s"m$i", set(c)).otherwise(acc)
          case (acc, _) => acc
        }
        val withInsert =
          if (source.columns.contains(c)) when(col("_action") === "insert", col(s"s.$c")).otherwise(updated)
          else updated
        withInsert.as(c)
      }

      val deleteActions = matched.zipWithIndex.collect { case (Delete(_), i) => s"m$i" }
      joined.withColumn("_action", action)
        .filter(col("_action") =!= "drop" && !col("_action").isin(deleteActions: _*))
        .select(outCols.toIndexedSeq: _*)
    }
  }
}

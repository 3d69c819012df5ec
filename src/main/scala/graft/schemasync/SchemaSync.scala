package graft.schemasync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

import graft.state.StateTable

/** Declared-schema synchronization (SURVEY.md §1.3, `flows/schema_sync
  * .py`): diff a declared `StructType` against the physical table and
  * migrate the store to match.
  *
  * The diff is pure (unit-testable); the applier realizes it on a
  * [[StateTable]]: ADD is a null-default projection, DROP is a column
  * rewrite (parquet has no in-place drop), CREATE writes an empty
  * version. Key/protected columns are never dropped (PK protection,
  * `flows/schema_sync.py:144`). At scale the rewrite is a single
  * column-pruned scan→write pass — no shuffle.
  */
object SchemaSync {

  sealed trait SchemaChange
  final case class CreateTable(schema: StructType) extends SchemaChange
  final case class AddColumn(field: StructField) extends SchemaChange
  final case class DropColumn(name: String) extends SchemaChange

  /** Pure diff: what must happen to `physical` to match `declared`.
    * Matching is by column name (type changes are out of scope, as in the
    * reference — `flows/schema_sync.py:102–155` only adds/drops).
    */
  def diff(
      declared: StructType,
      physical: Option[StructType],
      protectedCols: Set[String] = Set.empty): Seq[SchemaChange] =
    physical match {
      case None => Seq(CreateTable(declared))
      case Some(p) =>
        val have = p.fieldNames.toSet
        val want = declared.fieldNames.toSet
        val adds = declared.fields.toSeq.filterNot(f => have(f.name)).map(AddColumn.apply)
        val drops = p.fieldNames.toSeq
          .filterNot(n => want(n) || protectedCols(n) || n == StateTable.SeqCol)
          .map(DropColumn.apply)
        adds ++ drops
    }

  /** Apply `changes` to a DataFrame (projection algebra). */
  def project(df: DataFrame, changes: Seq[SchemaChange]): DataFrame =
    changes.foldLeft(df) {
      case (d, AddColumn(f)) => d.withColumn(f.name, lit(null).cast(f.dataType))
      case (d, DropColumn(n)) => d.drop(n)
      case (d, CreateTable(_)) => d
    }

  /** Sync a state table to the declared schema; returns the changes that
    * were applied (empty ⇒ already in sync).
    */
  def sync(
      spark: SparkSession,
      table: StateTable,
      declared: StructType,
      protectedCols: Set[String] = Set.empty): Seq[SchemaChange] = {
    val physical = table.read().map(df => StructType(df.schema.filterNot(_.name == StateTable.SeqCol)))
    val changes = diff(declared, physical, protectedCols)
    changes match {
      case Seq(CreateTable(schema)) =>
        table.overwrite(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(schema.fields :+ StructField(StateTable.SeqCol, org.apache.spark.sql.types.LongType))))
      case Seq() => ()
      case cs =>
        table.read().foreach(df => table.overwrite(project(df, cs)))
    }
    changes
  }
}

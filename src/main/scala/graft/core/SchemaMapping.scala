package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Declarative select + rename + cast engine.
  *
  * Spark-native analog of the reference's per-pipeline ordered
  * `COLUMN_MAPPING_AND_TYPES` dict (reference: `ETL - Faturamento
  * B2B.py:21-51` and its type→DDL conversion `:54-72`): keep only the
  * mapped columns, rename them, and cast to the declared type, with
  * optional per-column cleaning expressions applied before the cast
  * (the `.apply(clean_currency)` step of the reference pipelines).
  *
  * Compiles to a single `df.select(...)` — one projection node that
  * Catalyst folds into the scan (column pruning reaches parquet), so
  * the mapping costs nothing extra at 100 TB.
  */
final case class ColumnSpec(
    source: String,
    target: String,
    dataType: DataType,
    clean: Column => Column = identity)

final case class SchemaMapping(specs: Seq[ColumnSpec]) {

  /** Columns declared but absent from `df` (reference warns on these,
    * `ETL - Faturamento B2B.py:143-151`). */
  def missingIn(df: DataFrame): Seq[String] = {
    val have = df.columns.map(_.toLowerCase).toSet
    specs.map(_.source).filterNot(c => have.contains(c.toLowerCase))
  }

  /** Apply the mapping: one narrow projection, no shuffle. */
  def apply(df: DataFrame): DataFrame = {
    val present = df.columns.map(c => c.toLowerCase -> c).toMap
    val cols = specs.flatMap { spec =>
      present.get(spec.source.toLowerCase).map { actual =>
        spec.clean(col(actual)).cast(spec.dataType).as(spec.target)
      }
    }
    df.select(cols: _*)
  }
}

object SchemaMapping {
  def of(specs: ColumnSpec*): SchemaMapping = SchemaMapping(specs)
}

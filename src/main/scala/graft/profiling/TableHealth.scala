package graft.profiling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-health / linter audit — the reference's schema-integrity
  * report family (`Database Linter.py:37-90` PK/ID audit + repair
  * report, `scripts_sql/Verificador_de_Integridade.sql:4-57`
  * per-table `Possui PK` / `Colunas PK` / row-count report).
  *
  * MySQL's information_schema doesn't exist for parquet tables, so
  * the audit is data-driven: a column set is a healthy PK when it is
  * unique and null-free IN THE DATA, and referential health is an
  * orphan count against the parent table. That is strictly stronger
  * than the reference's catalog check (a declared PK can't have dups;
  * an undeclared-but-clean key passes here and is flagged there — the
  * `pk_candidata` column carries which key was audited).
  *
  * Cost shape per table: ONE aggregation pass (count + distinct-key +
  * null-key in the same agg), riding a left join to the parent keys
  * when an FK is declared — the join is key-to-key (parent side is
  * the distinct key projection, small relative to the child), so at
  * 100 TB the audit is a shuffle on the FK, not a second scan. The
  * per-table one-row results union into the report; no driver-side
  * loops over data.
  */
object TableHealth {

  /** One audited table: its declared PK-candidate columns and an
    * optional FK → (parent table, parent key) to orphan-check. */
  final case class TableSpec(
      name: String,
      df: DataFrame,
      keyCols: Seq[String],
      fk: Option[(String, DataFrame, String)] = None)

  private val simNao: Column => Column = ok =>
    when(ok, "✅ SIM").otherwise("❌ NÃO")

  private def health(t: TableSpec): DataFrame = {
    // distinct over a STRUCT of the key columns, not a string concat:
    // a separator-based concat miscounts keys whose values contain
    // the separator ("x|y","z" vs "x","y|z") and concat_ws silently
    // drops nulls ((1,null) vs (null,1)). The struct itself is never
    // null, so fully/partially-null keys count as distinct values —
    // the null tally is reported separately. Oracle mirrors with
    // struct_pack.
    val keyStruct = struct(t.keyCols.map(col): _*)
    val keyNull = t.keyCols.map(col(_).isNull).reduce(_ || _)
    val (joined, fkCol, orphan) = t.fk match {
      case Some((fkName, parent, parentKey)) =>
        // distinct parent keys: row-preserving for the child-side
        // aggregates even if the parent itself has duplicate keys
        // (this is a health tool — assume nothing is clean)
        val parentKeys = parent.select(col(parentKey).as("__pk")).distinct()
        (t.df.join(parentKeys, col(fkName) === col("__pk"), "left"),
          fkName,
          sum((col(fkName).isNotNull && col("__pk").isNull).cast("long")))
      case None =>
        (t.df, "---", lit(0L))
    }
    joined
      .agg(
        count(lit(1)).as("linhas"),
        countDistinct(keyStruct).as("chaves_distintas"),
        sum(keyNull.cast("long")).as("chaves_nulas"),
        orphan.as("fk_orfas"))
      .select(
        lit(t.name).as("tabela"),
        lit(t.keyCols.mkString(", ")).as("pk_candidata"),
        col("linhas"),
        simNao(col("chaves_distintas") === col("linhas") &&
          col("chaves_nulas") === 0).as("possui_pk"),
        (col("linhas") - col("chaves_distintas")).as("chaves_duplicadas"),
        col("chaves_nulas"),
        lit(fkCol).as("fk_coluna"),
        col("fk_orfas"),
        simNao(col("fk_orfas") === 0).as("fk_integra"))
  }

  /** The full report: one row per audited table. */
  def report(specs: Seq[TableSpec]): DataFrame =
    specs.map(health).reduce(_.unionByName(_))
}

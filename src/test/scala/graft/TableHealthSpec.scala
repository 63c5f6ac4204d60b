package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.profiling.TableHealth
import graft.profiling.TableHealth.TableSpec

/** The pr3 oracle proves the clean-fixture path; this spec proves the
  * DIRTY branches — duplicate keys, null keys, orphan FKs — which are
  * the entire point of a health linter. */
class TableHealthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def row(name: String) = {
    val specs = Seq(
      TableSpec("filhos",
        Seq((1, 10), (1, 20), (3, 99), (4, 30))
          .toDF("id", "parent_id")
          .withColumn("parent_id",
            org.apache.spark.sql.functions
              .when($"id" === 3, null).otherwise($"parent_id")),
        Seq("id"),
        Some(("parent_id",
          Seq(10, 20).toDF("pid"), "pid"))),
      TableSpec("pais", Seq(10, 20).toDF("pid"), Seq("pid")))
    TableHealth.report(specs).filter($"tabela" === name).collect()(0)
  }

  test("duplicate keys flag possui_pk NÃO and count the dups") {
    val r = row("filhos")
    assert(r.getAs[Long]("linhas") == 4)
    assert(r.getAs[Long]("chaves_duplicadas") == 1) // id=1 twice
    assert(r.getAs[String]("possui_pk").endsWith("NÃO"))
  }

  test("orphan FKs are counted, null FKs are not orphans") {
    val r = row("filhos")
    // parent_id=30 has no parent; parent_id=null (id=3) must NOT count
    assert(r.getAs[Long]("fk_orfas") == 1)
    assert(r.getAs[String]("fk_integra").endsWith("NÃO"))
  }

  test("clean table passes every check") {
    val r = row("pais")
    assert(r.getAs[String]("possui_pk").endsWith("SIM"))
    assert(r.getAs[Long]("chaves_duplicadas") == 0)
    assert(r.getAs[Long]("chaves_nulas") == 0)
    assert(r.getAs[Long]("fk_orfas") == 0)
  }

  test("composite key uniqueness uses all key columns") {
    val df = Seq((1, 1, "a"), (1, 2, "b"), (2, 1, "c")).toDF("k1", "k2", "v")
    val r = TableHealth.report(Seq(TableSpec("t", df, Seq("k1", "k2"))))
      .collect()(0)
    assert(r.getAs[String]("possui_pk").endsWith("SIM"))
    val dup = TableHealth.report(Seq(TableSpec("t", df, Seq("k1"))))
      .collect()(0)
    assert(dup.getAs[Long]("chaves_duplicadas") == 1)
  }

  test("composite keys never collide across column boundaries or nulls") {
    // ("x|y","z") vs ("x","y|z"): distinct keys a separator-concat
    // would merge; likewise (1,null) vs (null,1) with concat_ws's
    // null-skip. The struct-based distinct must call both unique.
    val sep = Seq(("x|y", "z"), ("x", "y|z")).toDF("a", "b")
    val r1 = TableHealth.report(Seq(TableSpec("sep", sep, Seq("a", "b"))))
      .collect()(0)
    assert(r1.getAs[Long]("chaves_duplicadas") == 0)
    assert(r1.getAs[String]("possui_pk").endsWith("SIM"))

    val nulls = Seq((Option(1), Option.empty[Int]), (Option.empty[Int], Option(1)))
      .toDF("a", "b")
    val r2 = TableHealth.report(Seq(TableSpec("nn", nulls, Seq("a", "b"))))
      .collect()(0)
    assert(r2.getAs[Long]("chaves_duplicadas") == 0)
    // but they ARE null keys, so the PK still fails on the null tally
    assert(r2.getAs[Long]("chaves_nulas") == 2)
    assert(r2.getAs[String]("possui_pk").endsWith("NÃO"))
  }
}

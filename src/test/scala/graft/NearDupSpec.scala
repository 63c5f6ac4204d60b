package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.NearDup

/** The facade on a NON-fixture corpus — proves the dedup stack is
  * generic over any (doc_id, text) DataFrame, not wired to the
  * benchmark tables (those paths are oracle-checked via x1/x2/x4/x14,
  * which delegate here). */
class NearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog today now"), // near dup of 1
    (4L, "completely different content about training data pipelines"),
    (5L, "completely different content about training data pipelines ok") // near dup of 4
  ).toDF("doc_id", "text")

  test("exactDedup keeps the minimum id per fingerprint") {
    val kept = NearDup.exactDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id_mantido") -> r.getAs[Long]("n_copias")).toMap
    assert(kept(1L) == 2) // docs 1+2 collapse
    assert(kept.keySet == Set(1L, 3L, 4L, 5L))
  }

  test("minhash candidates contain the exact Jaccard pairs (lossy only downward)") {
    val exact = NearDup.ngramJaccardPairs(docs, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = NearDup.minhashLshPairs(docs, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((1L, 2L)) && exact.contains((1L, 3L)))
    assert(lsh.subsetOf(exact), "LSH pairs must pass the same exact verify")
    assert(lsh.contains((1L, 2L)), "identical docs always share every band")
  }

  test("clusters chain transitively and survivors keep one doc per component") {
    val pairs = NearDup.ngramJaccardPairs(docs, threshold = 0.5)
    val byId = NearDup.clusters(docs, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonico")).toMap
    // 1~2, 1~3 (and possibly 2~3) chain into one component labeled 1
    assert(byId(1L) == 1L && byId(2L) == 1L && byId(3L) == 1L)
    assert(byId(4L) == byId(5L))
    val surv = NearDup.survivors(docs, pairs).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(surv == Set(1L, 4L))
  }
}

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

  test("substringDupPairs catches partial duplication doc-level hashing misses") {
    val para = "x" * 30 + " this exact paragraph was copied between documents " + "y" * 30
    // windows are position-aligned from the doc start (stride 32), so a
    // copied span collides only where both docs hit it at the same
    // offset mod stride — pin both prefixes to exactly 32 chars (in
    // production the stride makes alignment a probability-1 event for
    // spans ≫ win + stride; here we make it deterministic)
    val pre1 = "first doc intro ".padTo(32, '.')
    val pre2 = "second doc intro ".padTo(32, '-')
    val partial = Seq(
      (1L, pre1 + para + " and then it ends uniquely here."),
      (2L, pre2 + para + " but the closing words differ!!!"),
      (3L, "a third document with no copied material at all, long enough to window " +
        "but sharing nothing with the others beyond plain english words.")
    ).toDF("doc_id", "text")
    // doc-level: no exact dup
    assert(NearDup.exactDedup(partial).count() == 3)
    val pairs = NearDup.substringDupPairs(partial).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // substring-level: only (1,2) collide, on at least 2 aligned
    // windows (para spans 112 chars ≥ win + stride past both offsets)
    assert(pairs.keySet == Set((1L, 2L)), s"got ${pairs.keySet}")
    assert(pairs((1L, 2L)) >= 2)
  }

  test("substringDupPairs drops boilerplate windows above maxDf") {
    val template = "standard site navigation header with many repeated characters here!! "
    val many = (1L to 10L).map(i =>
      (i, template + s"unique body $i padded to be long enough for windows " + "z" * 40))
      .toDF("doc_id", "text")
    // template windows appear in all 10 docs; with maxDf=3 they are
    // suppressed, and the unique bodies share nothing
    val pairs = NearDup.substringDupPairs(many, maxDf = 3)
    assert(pairs.count() == 0, "boilerplate windows must not produce pairs")
    // raising the cap lets the template collide everything
    val loose = NearDup.substringDupPairs(many, maxDf = 10)
    assert(loose.count() == 10L * 9 / 2)
  }
}

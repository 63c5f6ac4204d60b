package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.RestSource

/** No network in the container — a fake transport drives the
  * pagination, provider-fallback and error-row logic (the testable
  * surface; JSON normalization downstream is the oracled n1/n2/n4
  * family). */
class RestSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("paginated stops at the first empty page") {
    val pages = Map(
      "api?page=1" -> """[{"id":1},{"id":2}]""",
      "api?page=2" -> """[{"id":3}]""",
      "api?page=3" -> "[]")
    var calls = 0
    val df = RestSource.paginated(spark,
      p => s"api?page=$p",
      url => { calls += 1; pages(url) })
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(calls == 3) // stopped AT the empty page, never asked for page 4
  }

  test("enrichByKey falls back across providers and emits error rows") {
    val fetch: String => String = {
      case "a/11444777000161" => """{"razao_social":"BELMICRO"}"""
      case url if url.startsWith("a/") => throw new RuntimeException("HTTP 429")
      case "b/404" => "" // empty body → not a hit
      case url if url.startsWith("b/") => """{"nome":"FALLBACK LTDA"}"""
    }
    val df = RestSource.enrichByKey(spark,
      Seq("11444777000161", "99999999999999", "404"),
      providers = Seq("brasilapi" -> (k => s"a/$k"), "cnpja" -> (k => s"b/$k")),
      fetch)
    val rows = df.orderBy("__key").collect()
    val byKey = rows.map(r => r.getAs[String]("__key") -> r).toMap
    assert(byKey("11444777000161").getAs[String]("fonte") == "brasilapi")
    assert(byKey("99999999999999").getAs[String]("fonte") == "cnpja")
    // both providers failed for key 404 (a/ throws, b/ empty)
    assert(byKey("404").isNullAt(byKey("404").fieldIndex("fonte")))
    assert(byKey("404").getAs[String]("erro") == "all providers failed")
  }

  test("withRetry follows the reference's exponential backoff schedule") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky: String => String = _ => {
      calls += 1
      if (calls < 3) throw new RuntimeException("HTTP 503") else "ok"
    }
    val fetch = RestSource.withRetry(flaky, sleep = sleeps += _)
    assert(fetch("u") == "ok")
    assert(calls == 3)
    assert(sleeps.toSeq == Seq(800L, 1600L)) // 0.8·2^0, 0.8·2^1 seconds
    // exhausted retries rethrow the last error
    val dead = RestSource.withRetry(_ => throw new RuntimeException("down"),
      retries = 2, sleep = _ => ())
    val e = intercept[RuntimeException](dead("u"))
    assert(e.getMessage == "down")
  }

  test("payload parses as nested struct for the oracled JSON surface") {
    val df = RestSource.enrichByKey(spark, Seq("1"),
      providers = Seq("p" -> (k => k)),
      fetch = _ => """{"qsa":[{"nome":"A"},{"nome":"B"}]}""")
    val socios = df.selectExpr("payload.qsa.nome").collect()(0).getSeq[String](0)
    assert(socios == Seq("A", "B"))
  }
}

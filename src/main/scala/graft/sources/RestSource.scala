package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** REST-API source wrapper — the reference's API-enrichment shape
  * (S9: `cnpj_core.py` per-key GET with provider fallback + rate
  * limit, `API Extrator Renda Per Capita - IBGE.py:11-29` paged
  * collection). The TRANSPORT IS INJECTED (`fetch: url → body`):
  * the zero-egress container has no network, and a seam there is
  * also the right library design — unit tests drive the pagination /
  * fallback / rate-limit logic with a fake transport, and production
  * plugs `java.net.http.HttpClient` in one line.
  *
  * Results land as `spark.read.json` DataFrames, so the downstream
  * normalization is the already-oracled JSON surface (n1 key-
  * coalescing extract, n2 nested explode, n4 envelope unwrap).
  *
  * Scale note: a REST API is a DRIVER-SIDE source for bounded key
  * sets (the reference enriches dims, not facts). Corpus-scale
  * enrichment belongs in a batch dataset join; this wrapper
  * deliberately offers no distributed fetch.
  */
object RestSource {

  type Fetch = String => String

  /** The reference's retry policy (`cnpj_core.py:61-99`: 3 retries,
    * exponential backoff 0.8·2^n seconds) as a transport decorator.
    * The sleeper is injectable so tests assert the schedule without
    * waiting it out. */
  def withRetry(
      fetch: Fetch,
      retries: Int = 3,
      backoffBaseSeconds: Double = 0.8,
      sleep: Long => Unit = Thread.sleep): Fetch = url => {
    var attempt = 0
    var result: Option[String] = None
    var lastErr: Throwable = null
    while (result.isEmpty && attempt <= retries) {
      try result = Some(fetch(url))
      catch {
        case scala.util.control.NonFatal(e) =>
          lastErr = e
          if (attempt < retries)
            sleep((backoffBaseSeconds * (1L << attempt) * 1000).toLong)
      }
      attempt += 1
    }
    result.getOrElse(throw lastErr)
  }

  /** Paged GET until a page yields no rows (the IBGE loop): page
    * bodies parse as one JSON array or object per page. */
  def paginated(
      spark: SparkSession,
      pageUrl: Int => String,
      fetch: Fetch,
      maxPages: Int = 100,
      minIntervalMs: Long = 0L): DataFrame = {
    import spark.implicits._
    val pages = Iterator.from(1).take(maxPages)
      .map { p =>
        if (minIntervalMs > 0 && p > 1) Thread.sleep(minIntervalMs)
        fetch(pageUrl(p))
      }
      .takeWhile(body => body != null && body.trim.nonEmpty &&
        body.trim != "[]" && body.trim != "{}")
      .toSeq
    toJsonDf(spark, pages.toDS())
  }

  /** Per-key GET with ordered provider fallback (brasilapi → cnpja
    * in the reference): first provider whose fetch succeeds AND
    * returns non-empty wins; keys where every provider fails yield an
    * error row, mirroring the reference's `{"erro": ...}` records. */
  def enrichByKey(
      spark: SparkSession,
      keys: Seq[String],
      providers: Seq[(String, String => String)], // (name, key → url)
      fetch: Fetch,
      minIntervalMs: Long = 0L): DataFrame = {
    import spark.implicits._
    val bodies = keys.zipWithIndex.map { case (k, i) =>
      if (minIntervalMs > 0 && i > 0) Thread.sleep(minIntervalMs)
      val hit = providers.iterator.flatMap { case (name, urlFor) =>
        try {
          val body = fetch(urlFor(k))
          if (body != null && body.trim.nonEmpty) Some((name, body)) else None
        } catch { case scala.util.control.NonFatal(_) => None }
      }.nextOption()
      hit match {
        case Some((name, body)) =>
          // stitch key + provenance into the payload (the reference's
          // "fonte" field) without reparsing it
          s"""{"__key":${jsonStr(k)},"fonte":${jsonStr(name)},"payload":$body}"""
        case None =>
          s"""{"__key":${jsonStr(k)},"fonte":null,"payload":null,"erro":"all providers failed"}"""
      }
    }
    toJsonDf(spark, bodies.toDS())
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def toJsonDf(spark: SparkSession, ds: Dataset[String]): DataFrame =
    spark.read.json(ds)
}

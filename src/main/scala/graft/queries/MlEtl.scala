package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{ColumnSpec, Det, SchemaMapping, Tables}
import graft.etl.StagingPipeline
import graft.functions.BrFunctions._
import graft.multimodal.Multimodal

/** SURVEY.md §2.11 ML/statistical operators, §1.3 profiling /
  * star-schema induction, §3.1 staging ETL, and the multimodal
  * metadata path — each as an oracle-checked query.
  */
object MlEtl {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  /** Closed-form argmax over candidate hinge knots: exact integer
    * moments `(n, sx, sxx, sh, shh, sth, sy, sxy, shy)` for the basis
    * `(1, t, max(0, t−c))` per candidate c, 3-parameter OLS by Cramer,
    * keep the best-fit knot (max explained term — SSE argmin without
    * Σy², which is knot-independent; ties → earliest c). Runs ON THE
    * DRIVER over the pinned months-sized series (m1 v6): every stage
    * of the greedy selection was a separate Spark job on a local
    * relation whose compute is microseconds — 4 stages cost ~1.1 s of
    * pure job/compile overhead (measured), so the scan now lives where
    * the data already is. Engine-equivalence is unchanged: integer
    * sums are order-free, y-free minors and det stay in exact long
    * arithmetic, and the double expressions replicate hingeKnotSql's
    * shape operation-for-operation (IEEE ops on identical inputs are
    * bit-identical — the oracle still proves it end-to-end). */
  private[graft] def knotScan(series: Array[(Int, Long)],
      cands: Seq[Int]): Option[(Int, Double, Double, Double, Double)] = {
    val sols = cands.flatMap { c =>
      var n = 0L; var sx = 0L; var sxx = 0L; var sh = 0L; var shh = 0L
      var sth = 0L; var sy = 0L; var sxy = 0L; var shy = 0L
      series.foreach { case (t, y) =>
        val h = math.max(t - c, 0).toLong
        n += 1; sx += t; sxx += t.toLong * t; sh += h; shh += h * h
        sth += t * h; sy += y; sxy += t * y; shy += h * y
      }
      // y-free minors and det in exact long arithmetic; y-terms in
      // double — the IDENTICAL expression shape (and therefore the
      // identical IEEE doubles) as the hingeKnotSql oracle
      val det = n * (sxx * shh - sth * sth) - sx * (sx * shh - sth * sh) +
        sh * (sx * sth - sxx * sh)
      if (det == 0L) None
      else {
        def d(x: Long) = x.toDouble
        val b0 = (d(sy) * d(sxx * shh - sth * sth)
          - d(sx) * (d(sxy) * d(shh) - d(sth) * d(shy))
          + d(sh) * (d(sxy) * d(sth) - d(sxx) * d(shy))) / d(det)
        val b1 = (d(n) * (d(sxy) * d(shh) - d(sth) * d(shy))
          - d(sy) * d(sx * shh - sth * sh)
          + d(sh) * (d(sx) * d(shy) - d(sxy) * d(sh))) / d(det)
        val b2 = (d(n) * (d(sxx) * d(shy) - d(sxy) * d(sth))
          - d(sx) * (d(sx) * d(shy) - d(sxy) * d(sh))
          + d(sy) * d(sx * sth - sxx * sh)) / d(det)
        val expl = b0 * d(sy) + b1 * d(sxy) + b2 * d(shy)
        Some((c, b0, b1, b2, expl))
      }
    }
    // ORDER BY expl DESC, c LIMIT 1 — keep the strictly better
    // candidate, ties resolve to the smaller c
    sols.reduceOption((a, b) =>
      if (b._5 > a._5 || (b._5 == a._5 && b._1 < a._1)) b else a)
  }

  /** M1: seasonality-fitting forecast — the faithful port of the
    * reference's multiplicative-yearly-seasonality model
    * (`Modelo de Previsão de Vendas.py:69-93`, Prophet with
    * `seasonality_mode='multiplicative'`), expressed as classical
    * decomposition: (1) PIECEWISE-linear trend with AUTO-K greedily
    * selected changepoints (v6) — Prophet's trend is continuous
    * piecewise linear over candidate changepoints in the first
    * `changepoint_range=0.8` of history; the deterministic analog
    * scans every candidate knot c in that range, solves the
    * 3-parameter OLS basis `(1, t, max(0, t−c))` in closed form
    * (Cramer, [[hingeKnot]]) from EXACT integer-cent moments, keeps
    * the best-fit knot (ties → earliest), then repeats the identical
    * scan on the FLOOR-quantized integer-cent residuals, STOPPING
    * when a stage's explained term falls below 5% of the remaining
    * SSE (up to K=4 — the data decides K, the deterministic analog
    * of Prophet's L1-driven changepoint sparsity; each accepted
    * stage strictly reduces SSE by its explained term). Argmin trick: SSE = Σy² − (b0·Σy + b1·Σty + b2·Σhy)
    * and Σy² is knot-independent, so maximizing the explained term
    * needs no 128-bit Σy². Each knot scan is months × months rows —
    * trivially small at any corpus scale because it runs over the
    * already-aggregated monthly series; (2) per-calendar-month
    * multiplicative index = mean of `actual / trend`, with the
    * per-row ratios scaled to integer nano-units so the cross-month
    * mean is an ORDER-FREE integer sum (a raw double mean would
    * differ between engines in the last ulp); (3) fitted value =
    * trend × index. The previous seasonal-naive (lag-12 × trailing-
    * year growth) is kept as `previsao_naive` — the fallback when
    * fewer than two years of history exist; (4) 80% uncertainty band
    * (Prophet's default `interval_width=0.8`, the reference's
    * `yhat_lower`/`yhat_upper`) as residual quantiles around the
    * fit: residuals in exact integer cents, nearest-rank p10/p90
    * (pure integer rank selection — no interpolation, so both
    * engines pick the identical cent value), added back onto each
    * fitted point. Remaining fidelity delta vs Prophet: greedy
    * threshold-stopped selection instead of L1 regularization, and no
    * MAP smoothing. */
  val m1Forecast: Q = (s, d) => {
    // The monthly series is referenced by four downstream stages
    // (bounds, candidate knots, per-knot moments, the fit) and a
    // DataFrame re-executes its whole plan per reference — four scans
    // of orders for an ≤O(100)-row series. Pin it as a driver-local
    // relation (the IvfIndex.pin pattern for provably tiny frames):
    // ONE orders aggregate, then every stage reads local rows.
    val monthly = {
      val m = Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("ano"), month(col("o_orderdate")).as("mes"))
        .agg(sum(dec2(col("o_totalprice"))).as("total_dec"))
        .withColumn("t", (col("ano") - 1995) * 12 + col("mes") - 1)
        .withColumn("yc", (col("total_dec") * 100).cast("long"))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(m.collect().toSeq.asJava, m.schema)
    }
    // The whole greedy changepoint selection runs ON THE DRIVER over
    // the pinned rows ([[knotScan]] — m1 v6): candidates, per-stage
    // moments, Cramer solves, SSE gates, residual updates. Every
    // double replicates the oracle's expression order; the FLOOR
    // residual quantization has no .5 tie, so it is engine-exact.
    val monthRows = monthly.select(col("t"), col("yc")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val candSeq: Seq[Int] = if (monthRows.isEmpty) Nil else {
      val ts = monthRows.map(_._1)
      val tmin = ts.min; val tmax = ts.max
      ts.toSeq.filter(c =>
        c >= tmin + 1 && c <= tmin + math.floor((tmax - tmin) * 0.8))
    }
    // Degenerate-input guard (ADVICE r7): if no candidate survives
    // det≠0, the zero knot keeps the pipeline total — trend_t = 0 →
    // the when(trend_t > 0) guard nulls every ratio → previsao is
    // null on every row (the graceful degradation the lazy plan had).
    val (c1, b0, b1, b2, _) = knotScan(monthRows, candSeq)
      .getOrElse((0, 0.0, 0.0, 0.0, 0.0))
    // Stages 2..4 — greedy forward selection with an SSE-improvement
    // STOPPING RULE (m1 v6, r7 verdict item 6; previously a fixed
    // K=2): each stage quantizes the running residuals to exact
    // integer cents via FLOOR, rescans the same candidate set with
    // the same (1, t, hinge) basis, and is APPLIED only if its OLS
    // explained term covers ≥ 5% of the remaining SSE (Σrc², exact
    // integer; the OLS identity SSE_new = Σrc² − expl makes expl the
    // exact improvement). A rejected stage leaves the residuals
    // unchanged, so every later stage re-derives the same
    // sub-threshold knot and is rejected too — gating each unrolled
    // stage ≡ greedy stopping, which is what lets the fixed-depth
    // DuckDB oracle mirror a data-dependent K.
    var residRows: Array[(Int, Long)] = monthRows.map { case (t, yc) =>
      val tr = b0 + b1 * t + b2 * math.max(t - c1, 0)
      (t, yc - math.floor(tr).toLong)
    }
    // gated stage coefficients, zeroed when rejected — the trend sum
    // and residual update apply them unconditionally (0-contribution)
    val gated = Array.newBuilder[(Int, Double, Double, Double)]
    for (_ <- 2 to 4) {
      val sse = residRows.iterator
        .map { case (_, rc) => BigInt(rc) * BigInt(rc) }.sum
      val (gc, g0, g1, g2) = knotScan(residRows, candSeq)
        .filter(_._5 >= 0.05 * sse.toDouble)
        .map(k => (k._1, k._2, k._3, k._4))
        .getOrElse((0, 0.0, 0.0, 0.0))
      gated += ((gc, g0, g1, g2))
      residRows = residRows.map { case (t, rc) =>
        (t, rc - math.floor(g0 + g1 * t + g2 * math.max(t - gc, 0)).toLong)
      }
    }
    val stages = (c1, b0, b1, b2) +: gated.result()
    val trendCents = stages.map { case (c, s0, s1, s2) =>
      lit(s0) + lit(s1) * col("t") +
        lit(s2) * greatest(col("t") - lit(c), lit(0))
    }.reduce(_ + _)
    val based = monthly
      .withColumn("trend_t", trendCents / 100.0)
      .withColumn("ratio_scaled",
        when(col("trend_t") > 0,
          floor(col("total_dec").cast("double") / col("trend_t") * 1e9)))
    val seasonal = based.groupBy(col("mes").as("mes_s"))
      .agg(sum(col("ratio_scaled")).as("rs_sum"),
        count(col("ratio_scaled")).as("rs_n"))
    val ord = Window.orderBy(col("ano"), col("mes"))
    val last12 = ord.rowsBetween(-11, 0)
    val prior12 = ord.rowsBetween(-23, -12)
    val fit = based.join(broadcast(seasonal), col("mes") === col("mes_s"))
      .withColumn("total", col("total_dec").cast("double"))
      .withColumn("sazonalidade",
        round(col("rs_sum").cast("double") / (col("rs_n").cast("double") * 1e9), 6))
      .withColumn("previsao",
        when(col("rs_n") > 0 && col("trend_t").isNotNull,
          round(col("trend_t") *
            (col("rs_sum").cast("double") / (col("rs_n").cast("double") * 1e9)), 2)))
      .withColumn("lag12", lag(col("total_dec"), 12).over(ord).cast("double"))
      .withColumn("soma_12m", sum(col("total_dec")).over(last12).cast("double"))
      .withColumn("soma_12m_anterior", sum(col("total_dec")).over(prior12).cast("double"))
      .withColumn("previsao_naive",
        when(col("lag12").isNull || col("soma_12m_anterior").isNull ||
          col("soma_12m_anterior") === 0, lit(null))
          .otherwise(round(col("lag12") * (col("soma_12m") / col("soma_12m_anterior")), 2)))
      .withColumn("prev_cents", round(col("previsao") * 100).cast("long"))
    // 80% band: residuals in exact integer cents over the whole fitted
    // series (a months-sized set — the single-partition rank window is
    // inherently tiny no matter the corpus), nearest-rank p10/p90
    val resid = fit.filter(col("previsao").isNotNull)
      .select(((col("total_dec") * 100).cast("long") - col("prev_cents")).as("rc"))
    // qs is a 1-row (q_lo, q_hi) frame whose plan embeds the whole
    // fit (windows included) — left lazy it crossJoins back into fit
    // and Catalyst compiles the fit tree twice. Pin the two longs as
    // literals (same knot-pin rationale; exact integer cents).
    val qRow = resid
      .withColumn("rn", row_number().over(Window.orderBy(col("rc"))))
      .withColumn("nr", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .agg(
        min(when(col("rn") === greatest(ceil(col("nr") * 0.1), lit(1L)),
          col("rc"))).as("q_lo"),
        min(when(col("rn") === ceil(col("nr") * 0.9), col("rc"))).as("q_hi"))
      .head()
    // A global agg always yields exactly one row, but over an EMPTY
    // residual set (all-null previsao on a degenerate series) both
    // quantiles are null — getLong would NPE. Null bounds propagate a
    // null band instead (ADVICE r7).
    def qlit(i: Int): Column =
      if (qRow.isNullAt(i)) lit(null).cast("long") else lit(qRow.getLong(i))
    fit
      .withColumn("previsao_inferior",
        round((col("prev_cents") + qlit(0)) / 100.0, 2))
      .withColumn("previsao_superior",
        round((col("prev_cents") + qlit(1)) / 100.0, 2))
      .select(col("ano"), col("mes"), col("total"), col("previsao"),
        col("previsao_inferior"), col("previsao_superior"),
        col("sazonalidade"), col("previsao_naive"))
      .orderBy(col("ano"), col("mes"))
  }

  /** M2: per-group trend regression (per-seller RandomForest analog,
    * `ETL - Análise Preditiva…Machine Learning.py:89-154`, expressed
    * as per-group OLS over the time index — `regr_slope`/`regr_
    * intercept` are codegen'd declarative aggregates, one shuffle for
    * ALL groups at once, vs the reference's model-per-group loop). */
  val m2GroupRegression: Q = (s, d) => {
    val monthly = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1).as("t"))
      .agg(sum(dec2(col("o_totalprice"))).cast("double").as("total"))
    // OLS from exact-decimal moments: builtin regr_slope/intercept use
    // engine-specific streaming accumulation (Spark vs DuckDB differ in
    // the last ulp), so slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is
    // computed from order-independent exact sums, then divided in
    // double — deterministic on both engines. (In production the
    // builtin regr_* aggregates are the one-liner equivalent.)
    monthly.groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("t")).as("sx"),
        sum(col("t") * col("t")).as("sxx"),
        sum(dec2(col("total"))).as("sy"),
        sum(dec2(col("total")) * col("t")).as("sxy"))
      .withColumn("num",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double"))
      .withColumn("den",
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("tendencia", round(col("num") / col("den"), 4))
      .withColumn("intercepto", round(
        (col("sy").cast("double") - (col("num") / col("den")) * col("sx")) / col("n"), 4))
      .withColumn("previsao_proximo_mes",
        round(col("intercepto") + col("tendencia") * 84, 4))
      .select(col("c_nationkey"), col("tendencia"), col("intercepto"),
        col("n").as("n_meses"), col("previsao_proximo_mes"))
      .orderBy(col("c_nationkey"))
  }

  /** M4: rule-based priority scoring + bands + farol
    * (`ETL - CRM.py:169-247`) — the reference's row-wise Python loop as
    * ONE vectorized when-chain (SURVEY §2.11 note). Clock injected. */
  val m4PriorityScore: Q = (s, d) => {
    val lastOrder = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(max(col("o_orderdate")).as("ultimo_pedido"),
        count(lit(1)).as("n_pedidos"))
    Tables.customer(s, d)
      .join(lastOrder, col("c_custkey") === col("o_custkey"), "left")
      .withColumn("dias_sem_comprar",
        datediff(lit("2002-01-01").cast("date"), to_date(col("ultimo_pedido"))))
      .withColumn("score",
        when(col("dias_sem_comprar").isNull, 0)
          .when(col("dias_sem_comprar") <= 180, 40)
          .when(col("dias_sem_comprar") <= 365, 25)
          .otherwise(10)
        + when(col("c_acctbal") > 5000, 30)
          .when(col("c_acctbal") > 0, 20)
          .otherwise(5)
        + when(col("n_pedidos") >= 20, 30)
          .when(col("n_pedidos") >= 10, 20)
          .when(col("n_pedidos").isNotNull, 10)
          .otherwise(0))
      .withColumn("prioridade",
        when(col("score") >= 80, "ALTA")
          .when(col("score") >= 50, "MÉDIA")
          .otherwise("BAIXA"))
      .withColumn("farol",
        when(col("prioridade") === "ALTA", "🟢 Verde")
          .when(col("prioridade") === "MÉDIA", "🟡 Amarelo")
          .otherwise("🔴 Vermelho"))
      .select(col("c_custkey"), col("dias_sem_comprar"), col("score"),
        col("prioridade"), col("farol"))
      .orderBy(col("c_custkey"))
  }

  /** M5: tiered commission calc (`PainelSDR_Gerencial.sql:17-24`). */
  val m5Commission: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_pedidos"))
      .withColumn("taxa",
        when(col("n_pedidos") <= 10, 5.0)
          .when(col("n_pedidos") <= 20, 7.0)
          .otherwise(9.0))
      .withColumn("comissao", col("n_pedidos") * col("taxa"))
      .orderBy(col("o_custkey"))

  /** PR1: column profiling — one aggregate pass over orders
    * (`Algoritmo de Estruturação de Dados.py:86-101`). */
  val pr1Profile: Q = (s, d) => {
    val o = Tables.orders(s, d)
    o.agg(
      count(lit(1)).as("linhas"),
      countDistinct(col("o_orderkey")).as("d_orderkey"),
      countDistinct(col("o_custkey")).as("d_custkey"),
      countDistinct(col("o_orderstatus")).as("d_status"),
      sum(col("o_totalprice").isNull.cast("long")).as("n_totalprice"),
      sum(col("o_orderdate").isNull.cast("long")).as("n_orderdate"))
  }

  /** PR2: star-schema induction classification per column
    * (`Algoritmo…Dados.py:129-255`): unique-ratio keys, numeric
    * measures, low-card dims — stats via one stack()ed pass. */
  val pr2StarInduction: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val n = count(lit(1))
    val stats = o.agg(
      n.as("n"),
      countDistinct(col("o_orderkey")).as("d_o_orderkey"),
      countDistinct(col("o_custkey")).as("d_o_custkey"),
      countDistinct(col("o_orderstatus")).as("d_o_orderstatus"),
      countDistinct(col("o_totalprice")).as("d_o_totalprice"),
      countDistinct(col("o_orderpriority")).as("d_o_orderpriority"))
    val cols = Seq(
      ("o_orderkey", "numeric", true), ("o_custkey", "numeric", true),
      ("o_orderstatus", "string", false), ("o_totalprice", "numeric", false),
      ("o_orderpriority", "string", false))
    val stacked = cols.map { case (c, t, looksId) =>
      stats.select(lit(c).as("coluna"),
        col(s"d_$c").as("distintos"), col("n").as("linhas"),
        lit(t).as("tipo"), lit(looksId).as("parece_id"))
    }.reduce(_.unionByName(_))
    stacked.withColumn("classe",
      when(col("parece_id") && col("distintos").cast("double") / col("linhas") > 0.95,
        "key_candidate")
        .when(col("parece_id"), "foreign_key")
        .when(col("tipo") === "numeric" &&
          col("distintos").cast("double") / col("linhas") > 0.2, "measure")
        .when(col("distintos") <= greatest(lit(50), col("linhas") / 100),
          "dim_attribute")
        .otherwise("text"))
      .select(col("coluna"), col("distintos"), col("linhas"), col("classe"))
      .orderBy(col("coluna"))
  }

  /** PR3: table-health / linter audit over the whole fixture schema
    * ([[graft.profiling.TableHealth]] — `Database Linter.py:37-90`,
    * `scripts_sql/Verificador_de_Integridade.sql:4-57`): per-table
    * PK-candidate uniqueness + null check, duplicate-key and null-key
    * tallies, orphan-FK count against the parent, SIM/NÃO status
    * columns in the reference's report shape. */
  val pr3TableHealth: Q = (s, d) => {
    import graft.profiling.TableHealth.{TableSpec, report}
    report(Seq(
      TableSpec("region", Tables.region(s, d), Seq("r_regionkey")),
      TableSpec("nation", Tables.nation(s, d), Seq("n_nationkey"),
        Some(("n_regionkey", Tables.region(s, d), "r_regionkey"))),
      TableSpec("customer", Tables.customer(s, d), Seq("c_custkey"),
        Some(("c_nationkey", Tables.nation(s, d), "n_nationkey"))),
      TableSpec("supplier", Tables.supplier(s, d), Seq("s_suppkey"),
        Some(("s_nationkey", Tables.nation(s, d), "n_nationkey"))),
      TableSpec("part", Tables.part(s, d), Seq("p_partkey")),
      TableSpec("orders", Tables.orders(s, d), Seq("o_orderkey"),
        Some(("o_custkey", Tables.customer(s, d), "c_custkey"))),
      TableSpec("lineitem", Tables.lineitem(s, d),
        Seq("l_orderkey", "l_linenumber"),
        Some(("l_orderkey", Tables.orders(s, d), "o_orderkey")))))
      .orderBy(col("tabela"))
  }

  /** ETL1: the full staging pipeline (SURVEY §3.1) end-to-end over
    * orders: mapping-select+rename, money cast, date coercion, status
    * normalization, null-key filter, injected load stamp. */
  val etl1Staging: Q = (s, d) => {
    val pipeline = StagingPipeline(
      mapping = SchemaMapping.of(
        ColumnSpec("o_orderkey", "pedido_id", LongType),
        ColumnSpec("o_custkey", "cliente_id", LongType),
        ColumnSpec("o_totalprice", "valor_total", DoubleType,
          c => c.cast(DecimalType(15, 2)).cast(DoubleType)),
        ColumnSpec("o_orderdate", "data_pedido", DateType),
        ColumnSpec("o_orderstatus", "status", StringType, normalizeText),
        ColumnSpec("o_orderpriority", "prioridade", StringType, normalizeText)),
      requiredKeys = Seq("pedido_id", "cliente_id", "data_pedido"),
      controlTotalCols = Seq("valor_total"),
      loadTimestamp = lit("2002-01-01 00:00:00").cast("timestamp"))
    pipeline.stage(Tables.orders(s, d)).orderBy(col("pedido_id"))
  }

  /** ETL2: pipeline audit — row count, control total, null profile of
    * the staged output in one aggregate (SURVEY §5 audits). */
  val etl2Audit: Q = (s, d) =>
    etl1Staging(s, d).agg(
      count(lit(1)).as("linhas"),
      sum(dec2(col("valor_total"))).cast("double").as("total_controle"),
      sum(col("cliente_id").isNull.cast("long")).as("nulos_cliente"),
      sum(col("data_pedido").isNull.cast("long")).as("nulos_data"))

  /** ETL3: join-coverage audit — the reference's enrichment
    * reconciliation (`ETL - CRM.py:158-160` "Cobertura IBGE: m de n
    * leads (p%)" + the unmatched-key extract of its RELATORIO
    * artifact, `:305-326`): per-key lead count, matched count,
    * coverage percent with an OK/PARCIAL/SEM ENRIQUECIMENTO status,
    * and the A9-style total row. The dim is deliberately partial
    * (n_nationkey < 20) so the unmatched branch is exercised; rows
    * with `com_match = 0` ARE the "Cidades_Sem_IBGE" extract. */
  val etl3JoinCoverage: Q = (s, d) => {
    val dim = Tables.nation(s, d).filter(col("n_nationkey") < 20)
      .select(col("n_nationkey"))
    // report key (segment) is COARSER than the join key (nation), as
    // in the reference's per-city coverage: groups genuinely mix
    // matched and unmatched rows, so PARCIAL is a reachable per-key
    // status, not just a total-row artifact. ROLLUP produces the
    // grand-total row in the same single pass.
    Tables.customer(s, d)
      .join(dim, col("c_nationkey") === col("n_nationkey"), "left")
      .rollup(col("c_mktsegment"))
      .agg(count(lit(1)).as("linhas"),
        sum(col("n_nationkey").isNotNull.cast("long")).as("com_match"))
      .select(
        coalesce(col("c_mktsegment"), lit("--- TOTAL ---")).as("chave"),
        col("linhas"), col("com_match"))
      .withColumn("cobertura_pct",
        round(col("com_match").cast("double") / col("linhas") * 100, 2))
      .withColumn("status",
        when(col("com_match") === 0, "SEM ENRIQUECIMENTO")
          .when(col("com_match") < col("linhas"), "PARCIAL")
          .otherwise("OK"))
      .orderBy(col("chave"))
  }

  /** X11: multimodal metadata at scan stage — binary payload column,
    * byte length + checksum + shard key as codegen'd expressions
    * (decode itself is the stubbed mapPartitions path, see
    * [[graft.multimodal.Multimodal]]). */
  val x11MultimodalMeta: Q = (s, d) =>
    Multimodal.scanMetadata(
      Multimodal.withBinaryPayload(Tables.documents(s, d)))
      .orderBy(col("doc_id"))

  /** X17: stubbed image resize — decode dims (FakeCodec) + quarter-dim
    * thumbnail over the batch mapPartitions path; the DuckDB oracle
    * re-derives the md5-based fake dims with nibble arithmetic, so the
    * whole decode→resize accounting is hash-checked. */
  val x17ResizeMeta: Q = (s, d) =>
    Multimodal.resize(s,
      Multimodal.withBinaryPayload(Tables.documents(s, d)))
      .toDF().orderBy(col("doc_id"))

  /** X18: stubbed video frame sampling — payload as 32-byte frames,
    * every 2nd full frame emitted with its checksum (generator-UDF
    * batch shape: one row in, n rows out, no shuffle). */
  val x18FrameSample: Q = (s, d) =>
    Multimodal.frameSample(s,
      Multimodal.withBinaryPayload(Tables.documents(s, d)))
      .toDF().orderBy(col("doc_id"), col("frame_no"))

  /** X94: stubbed audio silence trim — byte-sum frame energy, frames
    * under the floor dropped, kept-frame checksum proves the exact
    * surviving bytes ([[graft.multimodal.Multimodal.energyTrim]]). */
  val x94EnergyTrim: Q = (s, d) =>
    Multimodal.energyTrim(s,
      Multimodal.withBinaryPayload(Tables.documents(s, d)))
      .toDF().orderBy(col("doc_id"))

  val defs: Map[String, Q] = Map(
    "m1_forecast" -> m1Forecast,
    "x94_energy_trim" -> x94EnergyTrim,
    "m2_group_regression" -> m2GroupRegression,
    "m4_priority_score" -> m4PriorityScore,
    "m5_commission" -> m5Commission,
    "pr1_profile" -> pr1Profile,
    "pr2_star_induction" -> pr2StarInduction,
    "pr3_table_health" -> pr3TableHealth,
    "etl1_staging" -> etl1Staging,
    "etl2_audit" -> etl2Audit,
    "etl3_join_coverage" -> etl3JoinCoverage,
    "x11_multimodal_meta" -> x11MultimodalMeta,
    "x17_resize_meta" -> x17ResizeMeta,
    "x18_frame_sample" -> x18FrameSample)

  private val monthlySql =
    s"""(SELECT YEAR(o_orderdate) AS ano, MONTH(o_orderdate) AS mes,
        SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec
        FROM orders GROUP BY 1, 2)"""

  /** DuckDB mirror of the [[m1Forecast]] per-candidate hinge moments:
    * exact integer sums over `seriesCte × cands` for the basis
    * `(1, t, max(0, t−c))` with response column `yCol`. */
  private def hingeMomSql(seriesCte: String, yCol: String): String = s"""
        SELECT c, COUNT(*) AS n,
          CAST(SUM(t) AS BIGINT) AS sx, CAST(SUM(t*t) AS BIGINT) AS sxx,
          CAST(SUM(h) AS BIGINT) AS sh, CAST(SUM(h*h) AS BIGINT) AS shh,
          CAST(SUM(t*h) AS BIGINT) AS sth,
          CAST(SUM($yCol) AS BIGINT) AS sy,
          CAST(SUM(t*$yCol) AS BIGINT) AS sxy,
          CAST(SUM(h*$yCol) AS BIGINT) AS shy
        FROM (SELECT c, t, $yCol, GREATEST(t - c, 0) AS h
              FROM $seriesCte, cands)
        GROUP BY c"""

  /** DuckDB mirror of [[hingeKnot]] — Cramer solve + explained-term
    * argmax over the moments CTE `momCte`, expression shape written
    * identically to the Spark side. */
  private def hingeKnotSql(momCte: String): String = s"""
        SELECT c, b0, b1, b2, expl FROM (
          SELECT c, b0, b1, b2,
            b0 * CAST(sy AS DOUBLE) + b1 * CAST(sxy AS DOUBLE)
              + b2 * CAST(shy AS DOUBLE) AS expl
          FROM (
            SELECT c, sy, sxy, shy,
              (CAST(sy AS DOUBLE) * CAST(sxx*shh - sth*sth AS DOUBLE)
               - CAST(sx AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(shh AS DOUBLE)
                   - CAST(sth AS DOUBLE) * CAST(shy AS DOUBLE))
               + CAST(sh AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(sth AS DOUBLE)
                   - CAST(sxx AS DOUBLE) * CAST(shy AS DOUBLE)))
                / CAST(det AS DOUBLE) AS b0,
              (CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(shh AS DOUBLE)
                   - CAST(sth AS DOUBLE) * CAST(shy AS DOUBLE))
               - CAST(sy AS DOUBLE) * CAST(sx*shh - sth*sh AS DOUBLE)
               + CAST(sh AS DOUBLE) * (CAST(sx AS DOUBLE) * CAST(shy AS DOUBLE)
                   - CAST(sxy AS DOUBLE) * CAST(sh AS DOUBLE)))
                / CAST(det AS DOUBLE) AS b1,
              (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) * CAST(shy AS DOUBLE)
                   - CAST(sxy AS DOUBLE) * CAST(sth AS DOUBLE))
               - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) * CAST(shy AS DOUBLE)
                   - CAST(sxy AS DOUBLE) * CAST(sh AS DOUBLE))
               + CAST(sy AS DOUBLE) * CAST(sx*sth - sxx*sh AS DOUBLE))
                / CAST(det AS DOUBLE) AS b2
            FROM (SELECT *,
                n * (sxx*shh - sth*sth) - sx * (sx*shh - sth*sh)
                  + sh * (sx*sth - sxx*sh) AS det
              FROM $momCte)
            WHERE det <> 0))
        ORDER BY expl DESC, c LIMIT 1"""

  /** One pr3 oracle branch per table (same audit arithmetic as
    * [[graft.profiling.TableHealth]]). */
  private def healthBranchSql(
      table: String, keys: Seq[String],
      fk: Option[(String, String, String)]): String = {
    val kc = "struct_pack(" +
      keys.zipWithIndex.map { case (k, i) => s"k$i := $k" }.mkString(", ") + ")"
    val kNull = keys.map(k => s"$k IS NULL").mkString(" OR ")
    val orphan = fk match {
      case Some((fkCol, parent, pKey)) =>
        s"""(SELECT CAST(COALESCE(SUM(CASE WHEN c.$fkCol IS NOT NULL
              AND p.$pKey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
            FROM $table c
            LEFT JOIN (SELECT DISTINCT $pKey FROM $parent) p
              ON c.$fkCol = p.$pKey)"""
      case None => "CAST(0 AS BIGINT)"
    }
    s"""SELECT '$table' AS tabela, '${keys.mkString(", ")}' AS pk_candidata,
        COUNT(*) AS linhas,
        CASE WHEN COUNT(DISTINCT $kc) = COUNT(*)
              AND SUM(CASE WHEN $kNull THEN 1 ELSE 0 END) = 0
          THEN '✅ SIM' ELSE '❌ NÃO' END AS possui_pk,
        COUNT(*) - COUNT(DISTINCT $kc) AS chaves_duplicadas,
        CAST(SUM(CASE WHEN $kNull THEN 1 ELSE 0 END) AS BIGINT) AS chaves_nulas,
        '${fk.map(_._1).getOrElse("---")}' AS fk_coluna,
        $orphan AS fk_orfas
        FROM $table"""
  }

  private val pr3Sql: String = {
    val branches = Seq(
      healthBranchSql("region", Seq("r_regionkey"), None),
      healthBranchSql("nation", Seq("n_nationkey"),
        Some(("n_regionkey", "region", "r_regionkey"))),
      healthBranchSql("customer", Seq("c_custkey"),
        Some(("c_nationkey", "nation", "n_nationkey"))),
      healthBranchSql("supplier", Seq("s_suppkey"),
        Some(("s_nationkey", "nation", "n_nationkey"))),
      healthBranchSql("part", Seq("p_partkey"), None),
      healthBranchSql("orders", Seq("o_orderkey"),
        Some(("o_custkey", "customer", "c_custkey"))),
      healthBranchSql("lineitem", Seq("l_orderkey", "l_linenumber"),
        Some(("l_orderkey", "orders", "o_orderkey"))))
    s"""SELECT tabela, pk_candidata, linhas, possui_pk, chaves_duplicadas,
        chaves_nulas, fk_coluna, fk_orfas,
        CASE WHEN fk_orfas = 0 THEN '✅ SIM' ELSE '❌ NÃO' END AS fk_integra
      FROM (${branches.mkString("\n      UNION ALL\n")})
      ORDER BY tabela"""
  }

  val oracles: Map[String, String] = Map(
    "m1_forecast" -> s"""
      WITH monthly AS (
        SELECT ano, mes, total_dec,
          (ano - 1995) * 12 + mes - 1 AS t,
          CAST(total_dec * 100 AS BIGINT) AS yc
        FROM $monthlySql),
      bounds AS (SELECT MIN(t) AS tmin, MAX(t) AS tmax FROM monthly),
      cands AS (
        SELECT t AS c FROM monthly, bounds
        WHERE t >= tmin + 1
          AND t <= tmin + CAST(FLOOR((tmax - tmin) * 0.8) AS BIGINT)),
      mom AS (${hingeMomSql("monthly", "yc")}),
      knot AS (${hingeKnotSql("mom")}),
      resid2 AS (
        SELECT t, yc - CAST(FLOOR(b0 + b1 * t + b2 * GREATEST(t - c, 0))
            AS BIGINT) AS rc
        FROM monthly, knot),
      -- auto-K (m1 v6): stages 2..4 gate on expl >= 5% of remaining
      -- SSE (exact HUGEINT Σrc²); a rejected stage zeroes its
      -- coefficients, leaving residuals unchanged — gating each
      -- unrolled stage is exactly the greedy stopping rule
      sse2 AS (SELECT SUM(CAST(rc AS HUGEINT) * rc) AS s FROM resid2),
      mom2 AS (${hingeMomSql("resid2", "rc")}),
      knot2 AS (SELECT
          CASE WHEN expl >= 0.05 * CAST(s AS DOUBLE) THEN c ELSE 0 END AS c2,
          CASE WHEN expl >= 0.05 * CAST(s AS DOUBLE) THEN b0 ELSE 0.0 END AS g0,
          CASE WHEN expl >= 0.05 * CAST(s AS DOUBLE) THEN b1 ELSE 0.0 END AS g1,
          CASE WHEN expl >= 0.05 * CAST(s AS DOUBLE) THEN b2 ELSE 0.0 END AS g2
        FROM (${hingeKnotSql("mom2")}), sse2),
      resid3 AS (
        SELECT t, rc - CAST(FLOOR(g0 + g1 * t + g2 * GREATEST(t - c2, 0))
            AS BIGINT) AS rc
        FROM resid2, knot2),
      sse3 AS (SELECT SUM(CAST(rc AS HUGEINT) * rc) AS s FROM resid3),
      mom3 AS (${hingeMomSql("resid3", "rc")}),
      knot3 AS (SELECT
          CASE WHEN expl >= 0.05 * CAST(s AS DOUBLE) THEN c ELSE 0 END AS c3,
          CASE WHEN expl >= 0.05 * CAST(s AS DOUBLE) THEN b0 ELSE 0.0 END AS h0,
          CASE WHEN expl >= 0.05 * CAST(s AS DOUBLE) THEN b1 ELSE 0.0 END AS h1,
          CASE WHEN expl >= 0.05 * CAST(s AS DOUBLE) THEN b2 ELSE 0.0 END AS h2
        FROM (${hingeKnotSql("mom3")}), sse3),
      resid4 AS (
        SELECT t, rc - CAST(FLOOR(h0 + h1 * t + h2 * GREATEST(t - c3, 0))
            AS BIGINT) AS rc
        FROM resid3, knot3),
      sse4 AS (SELECT SUM(CAST(rc AS HUGEINT) * rc) AS s FROM resid4),
      mom4 AS (${hingeMomSql("resid4", "rc")}),
      knot4 AS (SELECT
          CASE WHEN expl >= 0.05 * CAST(s AS DOUBLE) THEN c ELSE 0 END AS c4,
          CASE WHEN expl >= 0.05 * CAST(s AS DOUBLE) THEN b0 ELSE 0.0 END AS i0,
          CASE WHEN expl >= 0.05 * CAST(s AS DOUBLE) THEN b1 ELSE 0.0 END AS i1,
          CASE WHEN expl >= 0.05 * CAST(s AS DOUBLE) THEN b2 ELSE 0.0 END AS i2
        FROM (${hingeKnotSql("mom4")}), sse4),
      -- per-stage parentheses pin the IEEE association to the Spark
      -- side's stage-term fold: ((stage1 + stage2) + stage3) + stage4
      based AS (
        SELECT ano, mes, total_dec, t,
          ((b0 + b1 * t + b2 * GREATEST(t - c, 0))
            + (g0 + g1 * t + g2 * GREATEST(t - c2, 0))
            + (h0 + h1 * t + h2 * GREATEST(t - c3, 0))
            + (i0 + i1 * t + i2 * GREATEST(t - c4, 0))) / 100.0 AS trend_t,
          CASE WHEN ((b0 + b1 * t + b2 * GREATEST(t - c, 0))
            + (g0 + g1 * t + g2 * GREATEST(t - c2, 0))
            + (h0 + h1 * t + h2 * GREATEST(t - c3, 0))
            + (i0 + i1 * t + i2 * GREATEST(t - c4, 0))) / 100.0 > 0
            THEN CAST(FLOOR(CAST(total_dec AS DOUBLE)
                   / (((b0 + b1 * t + b2 * GREATEST(t - c, 0))
                     + (g0 + g1 * t + g2 * GREATEST(t - c2, 0))
                     + (h0 + h1 * t + h2 * GREATEST(t - c3, 0))
                     + (i0 + i1 * t + i2 * GREATEST(t - c4, 0))) / 100.0) * 1e9)
                 AS BIGINT) END AS ratio_scaled
        FROM monthly, knot, knot2, knot3, knot4),
      seasonal AS (
        SELECT mes AS mes_s, CAST(SUM(ratio_scaled) AS BIGINT) AS rs_sum,
          COUNT(ratio_scaled) AS rs_n
        FROM based GROUP BY mes),
      naive AS (
        SELECT ano, mes,
          CASE WHEN lag12 IS NULL OR soma_ant IS NULL OR soma_ant = 0 THEN NULL
               ELSE ROUND(lag12 * (soma_12m / soma_ant), 2) END AS previsao_naive
        FROM (
          SELECT ano, mes,
            CAST(LAG(total_dec, 12) OVER ord AS DOUBLE) AS lag12,
            CAST(SUM(total_dec) OVER (ORDER BY ano, mes
              ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS DOUBLE) AS soma_12m,
            CAST(SUM(total_dec) OVER (ORDER BY ano, mes
              ROWS BETWEEN 23 PRECEDING AND 12 PRECEDING) AS DOUBLE) AS soma_ant
          FROM monthly
          WINDOW ord AS (ORDER BY ano, mes))),
      fitted AS (
        SELECT b.ano, b.mes, b.total_dec, CAST(b.total_dec AS DOUBLE) AS total,
          CASE WHEN rs_n > 0 AND trend_t IS NOT NULL
            THEN ROUND(trend_t
              * (CAST(rs_sum AS DOUBLE) / (CAST(rs_n AS DOUBLE) * 1e9)), 2)
            END AS previsao,
          ROUND(CAST(rs_sum AS DOUBLE) / (CAST(rs_n AS DOUBLE) * 1e9), 6)
            AS sazonalidade,
          naive.previsao_naive
        FROM based b
        JOIN seasonal ON b.mes = mes_s
        JOIN naive ON b.ano = naive.ano AND b.mes = naive.mes),
      qs AS (
        SELECT
          MIN(CASE WHEN rn = GREATEST(CAST(CEIL(nr * 0.1) AS BIGINT), 1)
            THEN rc END) AS q_lo,
          MIN(CASE WHEN rn = CAST(CEIL(nr * 0.9) AS BIGINT)
            THEN rc END) AS q_hi
        FROM (
          SELECT rc, ROW_NUMBER() OVER (ORDER BY rc) AS rn,
            COUNT(*) OVER () AS nr
          FROM (SELECT CAST(total_dec * 100 AS BIGINT)
                  - CAST(ROUND(previsao * 100) AS BIGINT) AS rc
                FROM fitted WHERE previsao IS NOT NULL)))
      SELECT ano, mes, total, previsao,
        ROUND((CAST(ROUND(previsao * 100) AS BIGINT) + q_lo) / 100.0, 2)
          AS previsao_inferior,
        ROUND((CAST(ROUND(previsao * 100) AS BIGINT) + q_hi) / 100.0, 2)
          AS previsao_superior,
        sazonalidade, previsao_naive
      FROM fitted, qs
      ORDER BY ano, mes""",
    "m2_group_regression" -> """
      SELECT c_nationkey,
        ROUND(num / den, 4) AS tendencia,
        ROUND((CAST(sy AS DOUBLE) - (num / den) * sx) / n, 4) AS intercepto,
        n AS n_meses,
        ROUND(ROUND((CAST(sy AS DOUBLE) - (num / den) * sx) / n, 4)
          + ROUND(num / den, 4) * 84, 4) AS previsao_proximo_mes
      FROM (
        SELECT c_nationkey, n, sx, sxx, sy, sxy,
          CAST(n * sxy - sx * sy AS DOUBLE) AS num,
          CAST(n * sxx - sx * sx AS DOUBLE) AS den
        FROM (
          SELECT c_nationkey, COUNT(*) AS n, SUM(t) AS sx, SUM(t*t) AS sxx,
            SUM(CAST(total AS DECIMAL(18,2))) AS sy,
            SUM(CAST(total AS DECIMAL(18,2)) * t) AS sxy
          FROM (SELECT c_nationkey,
                  (YEAR(o_orderdate) - 1995) * 12 + MONTH(o_orderdate) - 1 AS t,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
                FROM customer JOIN orders ON c_custkey = o_custkey
                GROUP BY 1, 2)
          GROUP BY c_nationkey))
      ORDER BY c_nationkey""",
    "m4_priority_score" -> """
      SELECT c_custkey, dias_sem_comprar, score,
        CASE WHEN score >= 80 THEN 'ALTA' WHEN score >= 50 THEN 'MÉDIA'
          ELSE 'BAIXA' END AS prioridade,
        CASE WHEN score >= 80 THEN '🟢 Verde' WHEN score >= 50 THEN '🟡 Amarelo'
          ELSE '🔴 Vermelho' END AS farol
      FROM (
        SELECT c_custkey, dias_sem_comprar, n_pedidos,
          (CASE WHEN dias_sem_comprar IS NULL THEN 0
                WHEN dias_sem_comprar <= 180 THEN 40
                WHEN dias_sem_comprar <= 365 THEN 25 ELSE 10 END
           + CASE WHEN c_acctbal > 5000 THEN 30 WHEN c_acctbal > 0 THEN 20
               ELSE 5 END
           + CASE WHEN n_pedidos >= 20 THEN 30 WHEN n_pedidos >= 10 THEN 20
               WHEN n_pedidos IS NOT NULL THEN 10 ELSE 0 END) AS score
        FROM (
          SELECT c_custkey, c_acctbal, n_pedidos,
            date_diff('day', CAST(ultimo_pedido AS DATE), DATE '2002-01-01')
              AS dias_sem_comprar
          FROM customer
          LEFT JOIN (SELECT o_custkey, MAX(o_orderdate) AS ultimo_pedido,
                       COUNT(*) AS n_pedidos
                     FROM orders GROUP BY o_custkey) o
            ON c_custkey = o_custkey))
      ORDER BY c_custkey""",
    "m5_commission" -> """
      SELECT o_custkey, COUNT(*) AS n_pedidos,
        CASE WHEN COUNT(*) <= 10 THEN 5.0 WHEN COUNT(*) <= 20 THEN 7.0
          ELSE 9.0 END AS taxa,
        COUNT(*) * CASE WHEN COUNT(*) <= 10 THEN 5.0 WHEN COUNT(*) <= 20 THEN 7.0
          ELSE 9.0 END AS comissao
      FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "pr1_profile" -> """
      SELECT COUNT(*) AS linhas,
        COUNT(DISTINCT o_orderkey) AS d_orderkey,
        COUNT(DISTINCT o_custkey) AS d_custkey,
        COUNT(DISTINCT o_orderstatus) AS d_status,
        CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_totalprice,
        CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_orderdate
      FROM orders""",
    "pr2_star_induction" -> """
      WITH stats AS (
        SELECT COUNT(*) AS n,
          COUNT(DISTINCT o_orderkey) AS d_o_orderkey,
          COUNT(DISTINCT o_custkey) AS d_o_custkey,
          COUNT(DISTINCT o_orderstatus) AS d_o_orderstatus,
          COUNT(DISTINCT o_totalprice) AS d_o_totalprice,
          COUNT(DISTINCT o_orderpriority) AS d_o_orderpriority
        FROM orders),
      stacked AS (
        SELECT 'o_orderkey' AS coluna, d_o_orderkey AS distintos, n AS linhas,
          'numeric' AS tipo, TRUE AS parece_id FROM stats
        UNION ALL SELECT 'o_custkey', d_o_custkey, n, 'numeric', TRUE FROM stats
        UNION ALL SELECT 'o_orderstatus', d_o_orderstatus, n, 'string', FALSE FROM stats
        UNION ALL SELECT 'o_totalprice', d_o_totalprice, n, 'numeric', FALSE FROM stats
        UNION ALL SELECT 'o_orderpriority', d_o_orderpriority, n, 'string', FALSE FROM stats)
      SELECT coluna, distintos, linhas,
        CASE WHEN parece_id AND CAST(distintos AS DOUBLE) / linhas > 0.95
               THEN 'key_candidate'
             WHEN parece_id THEN 'foreign_key'
             WHEN tipo = 'numeric' AND CAST(distintos AS DOUBLE) / linhas > 0.2
               THEN 'measure'
             WHEN distintos <= GREATEST(50, linhas // 100) THEN 'dim_attribute'
             ELSE 'text' END AS classe
      FROM stacked ORDER BY coluna""",
    "pr3_table_health" -> pr3Sql,
    "etl1_staging" -> """
      SELECT o_orderkey AS pedido_id, o_custkey AS cliente_id,
        CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS DOUBLE) AS valor_total,
        CAST(o_orderdate AS DATE) AS data_pedido,
        UPPER(TRIM(o_orderstatus)) AS status,
        UPPER(TRIM(o_orderpriority)) AS prioridade,
        TIMESTAMP '2002-01-01 00:00:00' AS data_carga_dw
      FROM orders
      WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
        AND o_orderdate IS NOT NULL
      ORDER BY pedido_id""",
    "etl2_audit" -> """
      SELECT COUNT(*) AS linhas,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS DECIMAL(18,2)))
          AS DOUBLE) AS total_controle,
        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS nulos_cliente,
        CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS nulos_data
      FROM orders
      WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
        AND o_orderdate IS NOT NULL""",
    "etl3_join_coverage" -> """
      SELECT COALESCE(c_mktsegment, '--- TOTAL ---') AS chave,
        COUNT(*) AS linhas,
        CAST(SUM(CASE WHEN n.n_nationkey IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS com_match,
        ROUND(CAST(SUM(CASE WHEN n.n_nationkey IS NOT NULL THEN 1 ELSE 0 END)
          AS DOUBLE) / COUNT(*) * 100, 2) AS cobertura_pct,
        CASE WHEN SUM(CASE WHEN n.n_nationkey IS NOT NULL THEN 1 ELSE 0 END) = 0
               THEN 'SEM ENRIQUECIMENTO'
             WHEN SUM(CASE WHEN n.n_nationkey IS NOT NULL THEN 1 ELSE 0 END)
               < COUNT(*) THEN 'PARCIAL'
             ELSE 'OK' END AS status
      FROM customer c
      LEFT JOIN (SELECT n_nationkey FROM nation WHERE n_nationkey < 20) n
        ON c.c_nationkey = n.n_nationkey
      GROUP BY ROLLUP (c_mktsegment)
      ORDER BY chave""",
    "x11_multimodal_meta" -> """
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        sha256(text) AS checksum,
        substring(sha256(text), 1, 2) AS shard_key
      FROM documents ORDER BY doc_id""",
    "x17_resize_meta" -> {
      // i-th md5 digest byte (0-based) rebuilt from two hex nibbles —
      // mirrors FakeCodec.decodeDims, which reads raw digest bytes
      def b(i: Int): String = {
        def nib(p: Int) =
          s"(strpos('0123456789abcdef', substring(md5(text), $p, 1)) - 1)"
        s"(16 * ${nib(2 * i + 1)} + ${nib(2 * i + 2)})"
      }
      s"""
      WITH dims AS (
        SELECT doc_id, text, octet_length(encode(text)) AS blen,
          160 + ((${b(0)} * 256 + ${b(1)}) % 481) AS w,
          120 + ((${b(2)} * 256 + ${b(3)}) % 361) AS h
        FROM documents)
      SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        CAST(greatest(w // 4, 1) AS INT) AS thumb_w,
        CAST(greatest(h // 4, 1) AS INT) AS thumb_h,
        CAST(least(blen, 256) AS BIGINT) AS thumb_len,
        md5(lower(substr(hex(encode(text)), 1, 512))) AS thumb_checksum
      FROM dims ORDER BY doc_id"""
    },
    "x18_frame_sample" -> """
      SELECT doc_id, CAST(f AS INT) AS frame_no,
        md5(lower(substr(hex(encode(text)), CAST(f AS INT) * 64 + 1, 64)))
          AS frame_checksum
      FROM documents, UNNEST(range(0, octet_length(encode(text)) // 32, 2)) AS t(f)
      ORDER BY doc_id, frame_no""",
    "x94_energy_trim" -> """
      WITH frames AS (
        SELECT doc_id, f,
          substr(lower(hex(encode(text))), CAST(f * 64 + 1 AS INT), 64) AS fh
        FROM documents,
          UNNEST(range(0, octet_length(encode(text)) // 32)) AS t(f)),
      e AS (
        SELECT doc_id, f, fh,
          list_sum(list_transform(range(0, 32), i ->
            (strpos('0123456789abcdef', substr(fh, CAST(2*i+1 AS INT), 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(fh, CAST(2*i+2 AS INT), 1)) - 1)))
            AS en
        FROM frames)
      SELECT doc_id, CAST(COUNT(*) AS INT) AS n_frames,
        CAST(SUM(CASE WHEN en >= 3000 THEN 1 ELSE 0 END) AS INT) AS n_kept,
        CAST(SUM(en) AS BIGINT) AS energy_total,
        md5(COALESCE(string_agg(fh, '' ORDER BY f)
          FILTER (WHERE en >= 3000), '')) AS kept_checksum
      FROM e GROUP BY doc_id ORDER BY doc_id""")
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{ColumnSpec, SchemaMapping, Tables}
import graft.etl.StagingPipeline
import graft.functions.BrFunctions._
import graft.multimodal.Multimodal
import graft.profiling.Profiler
import graft.queries.TrainingData

/** Engine-level behavior: schema mapping, staging audits, profiling
  * classification, dedup/ANN recall, multimodal plumbing. */
class EngineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("SchemaMapping selects, renames, casts, and reports missing columns") {
    val mapping = SchemaMapping.of(
      ColumnSpec("o_orderkey", "id", LongType),
      ColumnSpec("o_orderstatus", "status", StringType, normalizeText),
      ColumnSpec("ghost_column", "fantasma", StringType))
    val df = Tables.orders(spark, sf)
    assert(mapping.missingIn(df) == Seq("ghost_column"))
    val out = mapping(df)
    assert(out.columns.toSeq == Seq("id", "status"))
    assert(out.schema("id").dataType == LongType)
  }

  test("StagingPipeline audit: rows kept, control total, null profile") {
    val pipeline = StagingPipeline(
      mapping = SchemaMapping.of(
        ColumnSpec("o_orderkey", "pedido_id", LongType),
        ColumnSpec("o_totalprice", "valor", DecimalType(15, 2))),
      requiredKeys = Seq("pedido_id"),
      controlTotalCols = Seq("valor"),
      loadTimestamp = lit("2002-01-01 00:00:00").cast("timestamp"))
    val raw = Tables.orders(spark, sf)
    val audit = pipeline.audit(raw)
    assert(audit.rowsIn == raw.count())
    assert(audit.rowsKept == audit.rowsIn) // no null keys in fixture
    assert(audit.controlTotals("valor").signum > 0)
    assert(audit.nullCounts.values.forall(_ == 0))
    val staged = pipeline.stage(raw)
    assert(staged.columns.contains("data_carga_dw"))
  }

  test("Profiler classifies keys, measures and dim attributes") {
    val orders = Tables.orders(spark, sf)
    val profs = Profiler.profile(orders)
    val byName = profs.map(p => p.name -> p).toMap
    assert(byName("o_orderkey").uniqueRatio == 1.0)
    assert(Profiler.classify(orders, byName("o_orderkey")) == "key_candidate")
    assert(Profiler.classify(orders, byName("o_orderstatus")) == "dim_attribute")
    assert(Profiler.classify(orders, byName("o_totalprice")) == "measure")
    val (facts, dims) = Profiler.induceStar(orders)
    assert(dims.contains("o_orderstatus") && facts.contains("o_totalprice"))
  }

  test("Profiler.extractDim produces dedup'd dim + fact with surrogate key") {
    val orders = Tables.orders(spark, sf)
    val (dim, fact) = Profiler.extractDim(orders,
      Seq("o_orderstatus", "o_orderpriority"), "sk_status")
    assert(dim.count() == orders.select("o_orderstatus", "o_orderpriority").distinct().count())
    assert(fact.count() == orders.count())
    assert(fact.columns.contains("sk_status") && !fact.columns.contains("o_orderstatus"))
  }

  test("MinHash LSH recall vs exact n-gram Jaccard pairs >= 0.95") {
    val exact = TrainingData.x4NgramJaccard(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TrainingData.x2DedupMinhash(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.95, s"minhash recall $recall")
  }

  test("dedup clusters: every dup-pair shares one canonical label, survivors are minima") {
    val labels = TrainingData.x14DedupClusters(spark, sf)
    val byId = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pair endpoints must land in the same component
    TrainingData.x4NgramJaccard(spark, sf).select("id_a", "id_b").collect()
      .foreach { r =>
        assert(byId(r.getLong(0)) == byId(r.getLong(1)),
          s"pair ${r.getLong(0)}~${r.getLong(1)} split across components")
      }
    // canonical id is a member of its own component and minimal
    byId.foreach { case (id, c) => assert(c <= id && byId(c) == c) }
  }

  test("ANN LSH recall vs brute-force cosine top-10 >= 0.4 (isotropic data)") {
    val exact = TrainingData.x5AnnCosine(spark, sf)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TrainingData.x6AnnLsh(spark, sf)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.4, s"ann lsh recall $recall")
  }

  test("IVF ANN: Lloyd-trained quantizer recall >= untrained, >= 0.4") {
    val exact = TrainingData.x5AnnCosine(spark, sf)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(iters: Int): Double = {
      val ivf = TrainingData.ivfTopK(spark, sf, lloydIters = iters)
        .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & ivf).size.toDouble / exact.size
    }
    val untrained = recallOf(0)
    val trained = recallOf(2)
    assert(trained >= 0.4, s"trained ivf recall $trained")
    // index reuse + exhaustive-probe identity: ONE built index queried
    // with nprobe = nCells must reproduce brute-force exactly (probing
    // every cell IS the exact search)
    val emb = core.Tables.embeddings(spark, sf)
    val index = ml.IvfIndex.build(emb, nCells = 16, lloydIters = 2)
    val full = ml.IvfIndex
      .query(index, emb.filter(col("vec_id") < 5), nprobe = 16, topK = 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, "nprobe=nCells must equal brute-force top-k")
    println(s"[ivf] recall untrained=$untrained trained=$trained")
    // cell balance: max cell size of the trained vs untrained index
    def maxCell(iters: Int): Long = {
      val balance = TrainingData.ivfCells(spark, sf, lloydIters = iters)
        .groupBy("cell").count().collect().map(_.getAs[Long]("count"))
      println(s"[ivf] iters=$iters cells=${balance.length} max=${balance.max}")
      balance.max
    }
    assert(maxCell(2) <= maxCell(0),
      "Lloyd training must not worsen the largest cell")
  }

  test("Multimodal: scan metadata matches mapPartitions feature extraction") {
    val docs = Multimodal.withBinaryPayload(Tables.documents(spark, sf))
    val scan = Multimodal.scanMetadata(docs)
    val feats = Multimodal.extractFeatures(spark, docs)
    val joined = scan.as("a").join(feats.toDF().as("b"), Seq("doc_id"))
    val n = joined.count()
    assert(n == docs.count())
    assert(joined.filter(col("a.byte_len") =!= col("b.byte_len")).count() == 0)
    assert(joined.filter(col("a.checksum") =!= col("b.checksum")).count() == 0)
    val dims = feats.filter(f => f.width < 160 || f.width > 640 ||
      f.height < 120 || f.height > 480).count()
    assert(dims == 0)
  }

  test("sequence packing conserves tokens and fills interior sequences") {
    val docs = Tables.documents(spark, sf)
    val totalToks = docs
      .select(graft.text.TextFunctions.tokenCount(col("text")).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val packed = TrainingData.x25PackSequences(spark, sf)
    // every token lands in exactly one sequence slot — sub-sharding
    // redistributes docs but conserves the total
    assert(packed.agg(sum("n_tokens")).collect()(0).getLong(0) == totalToks)
    // all but the last sequence of each (source, sub_shard) hold
    // exactly 256 tokens — sequence spaces are independent per shard
    val short = packed
      .withColumn("last_seq", max(col("seq_id")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source", "sub_shard")))
      .filter(col("seq_id") < col("last_seq") && col("n_tokens") =!= 256)
      .count()
    assert(short == 0, s"$short interior sequences not exactly 256 tokens")
    // the skew split is real: every source with enough docs spreads
    // over >1 sub-shard. Restricted to sources with >=8 docs — the
    // md5 shard of a 1-2 doc source can legitimately land in one
    // sub-shard (P(all same of 4) = 4^(1-n)), and asserting spread
    // there would pin a property of the hash on this fixture, not of
    // packSequences.
    val srcDocs = docs.groupBy("source")
      .agg(countDistinct(col("doc_id")).as("docs"))
    val spreadless = packed.groupBy("source")
      .agg(countDistinct(col("sub_shard")).as("shards"))
      .join(srcDocs, "source")
      .filter(col("docs") >= 8 && col("shards") < 2).count()
    assert(spreadless == 0, "a >=8-doc source collapsed into a single sub-shard")
  }

  test("PII redaction scrubs every injected email and phone") {
    val out = TrainingData.x26PiiRedaction(spark, sf)
    // injected cadence: every 7th doc an email, every 11th a phone
    val bad = out.filter(
      (col("doc_id") % 7 === 0 && col("n_emails") < 1) ||
      (col("doc_id") % 11 === 0 && col("n_phones") < 1)).count()
    assert(bad == 0)
    // the redacted text has no residual matches: re-running redaction
    // over an already-redacted corpus must be a fixpoint
    val redacted = TrainingData.piiFixpointProbe(spark, sf)
    assert(redacted == 0, s"$redacted docs still match PII regexes after redaction")
  }

  test("domain mixture pro-rates the budget across sub-shards and fills each") {
    val out = TrainingData.x27DomainMixture(spark, sf)
    // the greedy prefix never starts a doc at or past its shard quota
    assert(out.filter(col("tok_antes") >= col("cota")).count() == 0)
    // pro-rating: per source, the shard quotas sum to within one
    // floor-rounding per shard of the 500-token budget
    val quotaSums = out.select(col("source"), col("sub_shard"), col("cota"))
      .distinct()
      .groupBy("source").agg(sum(col("cota")).as("q"),
        countDistinct(col("sub_shard")).as("shards"))
      .collect()
    for (r <- quotaSums) {
      val (q, shards) = (r.getLong(1), r.getLong(2))
      assert(q <= 500 && q > 500 - shards,
        s"source ${r.getString(0)}: quotas sum to $q over $shards shards")
    }
    // greedy prefix per shard: tokens kept reach the shard quota (or
    // the whole shard is smaller than it)
    val shardTotals = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        graft.text.TextFunctions.tokenCount(col("text"))
          .cast("long").as("n_tok"))
      .withColumn("sub_shard", pmod(conv(substring(
        md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long"), lit(4L)).cast("int"))
      .groupBy("source", "sub_shard").agg(sum("n_tok").as("total"))
    val wrong = out.groupBy("source", "sub_shard")
      .agg(sum(col("n_tok")).as("kept"), first(col("cota")).as("cota"))
      .join(shardTotals, Seq("source", "sub_shard"))
      .filter(col("kept") < col("cota") && col("kept") =!= col("total"))
      .count()
    assert(wrong == 0, "a sub-shard stopped before its quota with docs left over")
  }

  test("quality calibration keeps at most the top 40% of each source") {
    val out = TrainingData.x32QualityCalibration(spark, sf)
    assert(out.count() > 0)
    val totals = Tables.documents(spark, sf).groupBy("source")
      .agg(count(lit(1)).as("total"))
    // nearest-rank 60th-percentile cut: kept = n - cum(corte) <= 0.4n,
    // and everything kept sits strictly above the cut
    val bad = out.groupBy("source")
      .agg(count(lit(1)).as("kept"), min(col("quality")).as("minq"),
        first(col("corte")).as("corte"))
      .join(totals, "source")
      .filter(col("kept") > col("total") * 0.4 || col("minq") <= col("corte"))
      .count()
    assert(bad == 0, "a source kept more than its top 40% or leaked below the cut")
  }

  test("filtered ANN searches only the label-0 catalog, dense top-k") {
    val out = TrainingData.x34FilteredAnn(spark, sf)
    assert(out.count() > 0)
    val lab = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("nid"), col("label"))
    assert(out.join(lab, "nid").filter(col("label") =!= 0).count() == 0,
      "a neighbor escaped the metadata filter")
    // per query: ranks are dense 1..n with n <= 10
    val shape = out.groupBy("qid")
      .agg(count(lit(1)).as("n"), max(col("rk")).as("mx"))
      .filter(col("n") =!= col("mx") || col("n") > 10)
    assert(shape.count() == 0)
  }

  test("unigram log-perplexity is positive and conserves token counts") {
    val out = TrainingData.x39UnigramLogppl(spark, sf)
    // every doc has at least one token with corpus probability < 1,
    // so the mean negative log-probability is strictly positive
    assert(out.filter(col("ppl_proxy") <= 0).count() == 0)
    val bad = out.join(Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text"))
          .cast("long").as("n")), "doc_id")
      .filter(col("n_tok") =!= col("n")).count()
    assert(bad == 0, "per-doc token count disagrees with the tokenizer")
  }

  test("bigram log-perplexity conserves bigram counts and orders below-unigram") {
    val out = TrainingData.x40BigramLogppl(spark, sf)
    // no negative steps: c(w1 w2) <= c(w1) by construction
    assert(out.filter(col("ppl2_proxy") < 0).count() == 0)
    // conservation: a doc with n tokens has exactly n-1 bigrams; docs
    // with <2 tokens are absent (inner semantics, documented)
    val bad = out.join(Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text"))
          .cast("long").as("n")), "doc_id")
      .filter(col("n_bigrams") =!= col("n") - 1).count()
    assert(bad == 0, "n_bigrams != n_tok - 1 for some doc")
    // the conditional model can only be more predictable than the
    // unigram one ON AVERAGE over the corpus (per-doc it may not be)
    val m2 = out.agg(avg(col("ppl2_proxy"))).collect()(0).getDouble(0)
    val m1 = TrainingData.x39UnigramLogppl(spark, sf)
      .agg(avg(col("ppl_proxy"))).collect()(0).getDouble(0)
    assert(m2 < m1, s"bigram mean $m2 not below unigram mean $m1")
  }

  test("duplicate-3gram fraction conserves gram counts and bounds the ratio") {
    val out = TrainingData.x41GopherDupNgrams(spark, sf)
    assert(out.filter(col("dup_ratio") < 0 || col("dup_ratio") > 1).count() == 0)
    assert(out.filter(col("dup_3gram_n") > col("total_3grams")).count() == 0)
    // a doc with n tokens has exactly n-2 3-gram slots; <3-token docs absent
    val bad = out.join(Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text"))
          .cast("long").as("n")), "doc_id")
      .filter(col("total_3grams") =!= col("n") - 2).count()
    assert(bad == 0, "total_3grams != n_tok - 2 for some doc")
  }

  test("DSIR weights rank target-domain docs above the rest on average") {
    val out = TrainingData.x42DsirWeights(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("lang")), "doc_id")
    // the target LM is fit ON the en slice, so en docs must score
    // higher under ln p_target - ln p_raw in expectation
    val Array(enAvg, restAvg) = Seq("lang = 'en'", "lang <> 'en'").map(p =>
      out.filter(p).agg(avg(col("dsir_weight"))).collect()(0).getDouble(0)).toArray
    assert(enAvg > restAvg,
      s"target-domain mean $enAvg not above off-domain mean $restAvg")
    // conservation: weights are per-token means over the doc's tokens
    val bad = out.join(Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text"))
          .cast("long").as("n")), "doc_id")
      .filter(col("n_tok") =!= col("n")).count()
    assert(bad == 0, "per-doc token count disagrees with the tokenizer")
  }

  test("int8 quantization error stays under half a code step") {
    val out = TrainingData.x43EmbedQuantize(spark, sf)
    assert(out.count() == Tables.embeddings(spark, sf).count(),
      "a vector dropped out (zero-norm guard should not fire on the fixture)")
    // symmetric SQ8: |x - q*s| <= s/2 where the code step s = mx/127;
    // allow the 6dp output rounding on both columns
    val bad = out.filter(
      col("max_abs_err") > col("q_scale_x127") / 127 / 2 + lit(1e-6)).count()
    assert(bad == 0, "reconstruction error exceeds half a code step")
    // codes are bounded: the checksum of 64 codes in [-127,127]
    assert(out.filter(abs(col("q_checksum")) > 127L * 4096).count() == 0)
  }

  test("length histogram conserves docs and tokens per source") {
    val out = TrainingData.x38LengthHistogram(spark, sf)
    val expect = Tables.documents(spark, sf)
      .select(col("source"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .groupBy("source").agg(count(lit(1)).as("docs"), sum("n").as("toks"))
    val got = out.groupBy("source")
      .agg(sum("n_docs").as("docs2"), sum("n_tokens").as("toks2"))
    assert(expect.join(got, "source")
      .filter(col("docs") =!= col("docs2") || col("toks") =!= col("toks2"))
      .count() == 0)
    // buckets are the binary bit length: 2^b <= every bucket's docs' n_tok
    // is not directly visible post-agg, but bucket values must be sane
    assert(out.filter(col("balde") < 0 || col("balde") > 40).count() == 0)
  }

  test("per-source funnel reconciles with the global funnel") {
    val per = TrainingData.x37FunnelBySource(spark, sf)
      .agg(sum("bruto").as("b"), sum("idioma").as("i"),
        sum("qualidade").as("q"), sum("dedup_exato").as("d"))
      .collect()(0)
    val global = TrainingData.x21CurationFunnel(spark, sf).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(per.getLong(0) == global("bruto"))
    assert(per.getLong(1) == global("idioma"))
    assert(per.getLong(2) == global("qualidade"))
    // per-source distinct fingerprints can only over-count the global
    // distinct (identical text in two sources counts once globally)
    assert(per.getLong(3) >= global("dedup_exato"))
  }

  test("train split is complete, disjoint, and near the 90/5/5 recipe") {
    val out = TrainingData.x36TrainSplit(spark, sf)
    val total = Tables.documents(spark, sf).count()
    assert(out.count() == total)
    val frac = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / total).toMap
    assert(frac.keySet == Set("train", "val", "test"))
    // hash buckets approximate the recipe; the fixture is small, so
    // allow a generous but meaningful tolerance
    assert(math.abs(frac("train") - 0.90) < 0.05, s"train ${frac("train")}")
    assert(frac("val") > 0.01 && frac("val") < 0.10)
    assert(frac("test") > 0.01 && frac("test") < 0.10)
    // the split is a pure function of doc_id: bucket never disagrees
    // with the labeled split
    val bad = out.filter(
      (col("balde") < 90 && col("split") =!= "train") ||
      (col("balde") >= 90 && col("balde") < 95 && col("split") =!= "val") ||
      (col("balde") >= 95 && col("split") =!= "test")).count()
    assert(bad == 0)
  }

  test("semantic dedup labels are canonical min-ids with consistent survivors") {
    val out = TrainingData.x35SemanticDedup(spark, sf)
    assert(out.count() == Tables.embeddings(spark, sf).count())
    // canonical label is the component minimum: never above the member
    assert(out.filter(col("canonico") > col("vec_id")).count() == 0)
    // survivor flag is exactly "I am my own canonical"
    assert(out.filter(
      col("sobrevivente") =!= (col("vec_id") === col("canonico"))).count() == 0)
    // every canonical id is itself a surviving row
    val canon = out.select(col("canonico")).distinct()
    val surv = out.filter(col("sobrevivente")).select(col("vec_id"))
    assert(canon.join(surv, canon("canonico") === surv("vec_id"), "left_anti")
      .count() == 0)
  }

  test("label centroids equal the brute-force per-label mean") {
    val cents = TrainingData.x28LabelCentroids(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val brute = Tables.embeddings(spark, sf)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("m"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(cents.keySet == brute.keySet)
    // integer 2^24 quantization keeps the exact mean within 2^-24 per element
    val worst = cents.map { case (k, v) => math.abs(v - brute(k)) }.max
    assert(worst < 1e-6, s"centroid diverges from brute-force mean by $worst")
  }

  test("bloom-prefiltered dedup is bit-identical to the exact anti-join") {
    val exact = TrainingData.x22IncrementalDedup(spark, sf)
    val bloom = TrainingData.x29BloomDedup(spark, sf)
    assert(bloom.count() == exact.count())
    assert(bloom.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(bloom).count() == 0)
  }

  test("tf-idf top-k: ranks are dense per doc and idf falls with df") {
    val out = TrainingData.x30TfidfTopk(spark, sf).collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.values.forall(rs =>
      rs.map(_.getInt(5)).sorted.sameElements(1 to rs.length)))
    // within a doc at equal tf, a rarer token (lower df) never ranks
    // below a more common one
    val inverted = byDoc.values.exists { rs =>
      rs.exists(a => rs.exists(b =>
        a.getInt(5) < b.getInt(5) && a.getLong(2) == b.getLong(2) &&
          a.getLong(3) > b.getLong(3)))
    }
    assert(!inverted)
  }

  test("vocab coverage curve is monotone and conserves token mass") {
    val rows = TrainingData.x44VocabCoverage(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(100, 1000, 10000))
    val totalTok = Tables.documents(spark, sf)
      .select(explode(graft.text.TextFunctions.wsTokens(col("text"))))
      .count()
    // coverage rises with k; covered mass never exceeds the corpus
    assert(rows.map(_.getDouble(3)).sliding(2).forall(p => p(0) <= p(1)))
    assert(rows.forall(r => r.getLong(2) <= totalTok))
    // a cutoff at/above the whole vocabulary covers every occurrence
    val vocab = Tables.documents(spark, sf)
      .select(explode(graft.text.TextFunctions.wsTokens(col("text"))).as("t"))
      .distinct().count()
    rows.filter(_.getInt(0) >= vocab)
      .foreach(r => assert(r.getLong(2) == totalTok && r.getDouble(3) == 1.0))
    // partial-group interpolation: vocab_k tokens can't cover more
    // than vocab_k * max_count occurrences
    val maxC = Tables.documents(spark, sf)
      .select(explode(graft.text.TextFunctions.wsTokens(col("text"))).as("t"))
      .groupBy("t").count().agg(max("count")).collect()(0).getLong(0)
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1) * maxC))
  }

  test("cluster diversity matches the brute-force pairwise mean") {
    val out = TrainingData.x45ClusterDiversity(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val vecs = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for ((label, xs) <- vecs) {
      val n = xs.length
      // mean over ALL ordered pairs incl. self (the n² identity form)
      val brute = (for (a <- xs; b <- xs) yield
        a.zip(b).map { case (u, v) => (u - v) * (u - v) }.sum).sum / (n.toDouble * n)
      val (nOut, div) = out(label)
      assert(nOut == n)
      // 1e-6 component quantization perturbs a squared distance of
      // O(1) by O(1e-5); output rounding adds 1e-6
      assert(math.abs(div - brute) < 5e-4,
        s"label $label: query $div vs brute-force $brute")
    }
  }

  test("embedding covariance matches the brute-force matrix") {
    val out = TrainingData.x46EmbedCovariance(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val xs = Tables.embeddings(spark, sf).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = xs.length
    val dims = xs.head.length
    assert(out.size == dims * (dims + 1) / 2, "upper triangle incomplete")
    val mean = Array.tabulate(dims)(i => xs.map(_(i)).sum / n)
    for (i <- 0 until dims; j <- i until dims) {
      // biased (1/n) sample covariance, the n·P−S² identity's form
      val brute = xs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      // 1e-6 quantization of components bounds the cov perturbation
      // by ~2·max|x|·5e-7 per term; output rounds at 1e-8
      assert(math.abs(out((i, j)) - brute) < 2e-6,
        s"cov($i,$j): query ${out((i, j))} vs brute-force $brute")
    }
    // diagonal is a variance: never negative
    assert((0 until dims).forall(i => out((i, i)) >= 0))
  }

  test("embedding correlation matches brute force; diagonal is exactly 1") {
    val out = TrainingData.x48EmbedCorrelation(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val xs = Tables.embeddings(spark, sf).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = xs.length
    val dims = xs.head.length
    assert(out.size == dims * (dims + 1) / 2)
    // √ of a perfect square is IEEE-exact ⇒ corr_ii ≡ 1.0, not ≈
    assert((0 until dims).forall(i => out((i, i)) == 1.0))
    val mean = Array.tabulate(dims)(i => xs.map(_(i)).sum / n)
    val sd = Array.tabulate(dims)(i =>
      math.sqrt(xs.map(v => (v(i) - mean(i)) * (v(i) - mean(i))).sum / n))
    for (i <- 0 until dims; j <- i + 1 until dims) {
      val brute = xs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n / (sd(i) * sd(j))
      assert(math.abs(out((i, j)) - brute) < 1e-4,
        s"corr($i,$j): query ${out((i, j))} vs brute-force $brute")
      assert(out((i, j)) >= -1.0 && out((i, j)) <= 1.0)
    }
  }

  test("pca projection aligns with an independent eigensolve") {
    val out = TrainingData.x49PcaProject(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val xs = rows.map(_._2)
    val n = xs.length
    val dims = xs.head.length
    // independent route: the SAME 50-round max-abs power iteration on
    // the UNQUANTIZED covariance — verifies the 1e-6/1e-8 quantization
    // doesn't move the direction (asymptotic eigen-convergence is not
    // the contract: the fixture's spectrum is near-flat at small n,
    // so differently-converged solves legitimately diverge)
    val mean = Array.tabulate(dims)(i => xs.map(_(i)).sum / n)
    val cov = Array.tabulate(dims, dims)((i, j) =>
      xs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n)
    var v = Array.fill(dims)(1.0)
    for (_ <- 0 until 50) {
      val w = Array.tabulate(dims)(i => cov(i).zip(v).map { case (a, b) => a * b }.sum)
      val mx = w.map(math.abs).max
      v = w.map(_ / mx)
    }
    val bruteScores = rows.map { case (id, x) => id -> x.zip(v).map { case (a, b) => a * b }.sum }.toMap
    val ids = rows.map(_._1)
    val dot = ids.map(id => out(id) * bruteScores(id)).sum
    val na = math.sqrt(ids.map(id => out(id) * out(id)).sum)
    val nb = math.sqrt(ids.map(id => bruteScores(id) * bruteScores(id)).sum)
    assert(math.abs(dot / (na * nb)) > 0.999,
      s"quantized and unquantized pipelines should agree, cos=${dot / (na * nb)}")
    // power iteration from the uniform start must beat the average
    // coordinate variance (trace/d) — a monotone-improvement property
    // that holds at ANY iteration count and fixture
    val sMean = ids.map(out).sum / n
    val sVar = ids.map(id => (out(id) - sMean) * (out(id) - sMean)).sum / n
    val avgCoordVar = (0 until dims).map(i => cov(i)(i)).sum / dims
    assert(sVar >= avgCoordVar,
      s"PC1 variance $sVar should beat the average coordinate variance $avgCoordVar")
  }

  test("whitening: unit variance, centered, decorrelated components") {
    // the whitening contract itself: each retained direction has
    // empirical variance 1 (exact by the Rayleigh-quotient scaling,
    // up to the 1e-6/1e-8 quantization), mean 0 (the μ·u offset), and
    // the two components decorrelate (deflation orthogonality)
    val out = TrainingData.defs("x65_embed_whiten")(spark, sf).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val n = out.length
    assert(n > 0)
    def stats(xs: Array[Double]): (Double, Double) = {
      val mu = xs.sum / n
      (mu, xs.map(x => (x - mu) * (x - mu)).sum / n)
    }
    val (m1, v1) = stats(out.map(_._1))
    val (m2, v2) = stats(out.map(_._2))
    assert(math.abs(v1 - 1.0) < 1e-2, s"w1 variance $v1 should be 1")
    assert(math.abs(v2 - 1.0) < 1e-2, s"w2 variance $v2 should be 1")
    assert(math.abs(m1) < 1e-3 && math.abs(m2) < 1e-3,
      s"whitened means should be 0, got $m1 / $m2")
    val cov12 = out.map { case (a, b) => (a - m1) * (b - m2) }.sum / n
    assert(math.abs(cov12 / math.sqrt(v1 * v2)) < 0.1,
      s"whitened components should decorrelate, corr=${cov12 / math.sqrt(v1 * v2)}")
  }

  test("mixture weights: probabilities sum to 1, epochs conserve the budget") {
    val out = TrainingData.x50MixtureWeights(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-4, "p_sample should sum to 1")
    // temperature α=1/2 flattens: every source's epochs stays within
    // the min/max ratio the α-power law predicts, and Σ tok_s·epochs_s
    // conserves the one-epoch-equivalent budget
    val budget = out.map(_._2).sum.toDouble
    val spent = out.map(t => t._2 * t._4).sum
    assert(math.abs(spent - budget) / budget < 1e-4,
      s"token-weighted epochs $spent should equal the budget $budget")
    // α<1 ⇒ smaller sources repeat more: epochs ordering is the
    // reverse of token ordering
    val sorted = out.sortBy(_._2)
    assert(sorted.map(_._4).zip(sorted.map(_._4).drop(1)).forall { case (a, b) => a >= b },
      "epochs must be non-increasing in source size under α=1/2")
  }

  test("embedding standardization: z-scores have zero mean and unit variance per dim") {
    val rows = TrainingData.x51EmbedStandardize(spark, sf).collect()
      .map(r => (r.getInt(1), r.getDouble(2)))
    val byDim = rows.groupBy(_._1).map { case (i, zs) => i -> zs.map(_._2) }
    assert(byDim.nonEmpty)
    byDim.foreach { case (i, zs) =>
      val n = zs.length
      val mean = zs.sum / n
      val varr = zs.map(z => (z - mean) * (z - mean)).sum / n
      // z uses the biased (1/n) sigma, so sample variance of z is 1
      assert(math.abs(mean) < 1e-4, s"dim $i mean $mean")
      assert(math.abs(varr - 1.0) < 1e-3, s"dim $i variance $varr")
    }
  }

  test("ngram novelty matches a brute-force document-frequency count") {
    val out = TrainingData.x52NgramNovelty(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq
        .sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet)
      .filter(_._2.nonEmpty)
    val dfCount = docs.flatMap(_._2).groupBy(identity).map { case (g, o) => g -> o.length }
    assert(out.size == docs.length, "one row per shingled doc")
    docs.foreach { case (id, shs) =>
      val uniq = shs.count(g => dfCount(g) == 1)
      val (ng, nu, nov) = out(id)
      assert(ng == shs.size && nu == uniq, s"doc $id: ($ng,$nu) vs (${shs.size},$uniq)")
      assert(math.abs(nov - uniq.toDouble / shs.size) < 1e-3)
    }
  }

  test("source overlap: duplicate source reads 1.0, disjoint source reads low") {
    import spark.implicits._
    // B carries exactly A's texts (same shingle union ⇒ identical
    // signature); C shares no token with either
    val docs = ((0 until 10).map(i =>
        (i.toLong, s"alpha beta gamma delta epsilon tok$i zeta eta", "srcA")) ++
      (0 until 10).map(i =>
        (100L + i, s"alpha beta gamma delta epsilon tok$i zeta eta", "srcB")) ++
      (0 until 10).map(i =>
        (200L + i, s"qa$i wb$i ec$i rd$i te$i yf$i ug$i ih$i", "srcC")))
      .toDF("doc_id", "text", "source")
    val out = graft.dedup.NearDup.sourceMinhashOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.size == 3)
    assert(out(("srcA", "srcB")) == (16L, 1.0), "identical shingle unions must agree on every slot")
    assert(out(("srcA", "srcC"))._2 < 0.5, "token-disjoint sources should rarely collide")
    assert(out.values.forall { case (m, e) => m >= 0 && m <= 16 && e == m / 16.0 })
  }

  test("source overlap estimate tracks the exact shingle Jaccard on the fixture") {
    val out = TrainingData.x47SourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val sets = Tables.documents(spark, sf).select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        src -> rows.flatMap(_.getString(1).trim.split("\\s+").toSeq
          .sliding(3).filter(_.size == 3).map(_.mkString(" "))).toSet }
      .filter(_._2.nonEmpty)
    val srcs = sets.keys.toSeq.sorted
    assert(out.size == srcs.size * (srcs.size - 1) / 2, "one row per source pair")
    val devs = for (i <- srcs.indices; j <- i + 1 until srcs.size) yield {
      val (sa, sb) = (sets(srcs(i)), sets(srcs(j)))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      math.abs(out((srcs(i), srcs(j))) - exact)
    }
    // k=16 slots ⇒ per-pair std ≈ 0.125; the fixture is deterministic
    // so these are regression pins, sized fixture-robust (ADVICE r5)
    assert(devs.max <= 0.6, s"worst pair deviates ${devs.max}")
    assert(devs.sum / devs.size <= 0.2, s"mean deviation ${devs.sum / devs.size}")
  }

  test("char entropy matches a per-doc Shannon recomputation") {
    val out = TrainingData.x53CharEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.size == docs.length)
    docs.foreach { case (id, text) =>
      val counts = text.groupBy(identity).view.mapValues(_.length)
      val n = text.length.toDouble
      val h = -counts.values.map { c =>
        c / n * math.log(c / n) / math.log(2)
      }.sum
      val (nc, nd, bits) = out(id)
      assert(nc == text.length && nd == counts.size, s"doc $id counts")
      // 1e-4 log quantization bounds the drift well under 1e-3 bits
      assert(math.abs(bits - h) < 1e-3, s"doc $id: $bits vs $h")
    }
  }

  test("token fertility recomputes from raw per-source sums") {
    val out = TrainingData.x54TokenFertility(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1)).groupBy(_._1)
    assert(out.size == docs.size)
    val bpeish = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
    docs.foreach { case (src, rows) =>
      val texts = rows.map(_._2)
      val words = texts.map(_.trim.split("\\s+").length.toLong).sum
      val bp = texts.map(t => bpeish.findAllIn(t).length.toLong).sum
      val bytes = texts.map(_.getBytes("UTF-8").length.toLong).sum
      val (nDocs, nWords, nBp, nBytes, fert, bpt) = out(src)
      assert(nDocs == texts.length && nWords == words
        && nBp == bp && nBytes == bytes, s"source $src sums")
      assert(math.abs(fert - bp.toDouble / words) < 1e-3)
      assert(math.abs(bpt - bytes.toDouble / bp) < 1e-3)
    }
  }

  test("language divergence matches an exact JSD recomputation, in [0,1]") {
    val out = TrainingData.x55LangDivergence(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val rows = Tables.documents(spark, sf)
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = rows.groupBy(_._1)
    val corpus = rows.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val n = rows.length.toDouble
    assert(out.size == bySrc.size)
    bySrc.foreach { case (src, rs) =>
      val ns = rs.length.toDouble
      val pSrc = rs.groupBy(_._2).view.mapValues(_.length / ns).toMap
      val jsd = corpus.keys.map { l =>
        val p = pSrc.getOrElse(l, 0.0)
        val q = corpus(l) / n
        val m = (p + q) / 2
        (if (p > 0) p * math.log(p / m) else 0.0) + q * math.log(q / m)
      }.sum / 2 / math.log(2)
      val (nDocs, bits) = out(src)
      assert(nDocs == rs.length)
      assert(bits >= 0.0 && bits <= 1.0, s"JSD out of range: $bits")
      assert(math.abs(bits - jsd) < 2e-3, s"source $src: $bits vs $jsd")
    }
  }

  test("chunking covers every token with the declared stride and overlap") {
    val out = TrainingData.x56ChunkDocuments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet)
    val md = java.security.MessageDigest.getInstance("MD5")
    byDoc.foreach { case (id, chunks) =>
      val toks = docs(id); val n = toks.length
      val expected = (0 until (math.ceil(math.max(n - 128, 0) / 96.0).toInt + 1))
        .map(k => (k, k * 96, math.min(n - k * 96, 128)))
      assert(chunks.sortBy(_._2).map(c => (c._2, c._3, c._4)).toSeq == expected,
        s"doc $id chunk grid")
      // every token index is covered, consecutive chunks overlap by 32
      // (except a shorter final chunk), and the fp really is the md5
      // of the space-joined slice
      val covered = expected.flatMap { case (_, st, len) => st until (st + len) }.toSet
      assert(covered == (0 until n).toSet, s"doc $id coverage")
      chunks.sortBy(_._2).foreach { case (_, _, st, len, fp) =>
        val hex = md.digest(toks.slice(st, st + len).mkString(" ")
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(fp == hex, s"doc $id chunk at $st fp")
      }
    }
  }

  test("embedding outlier scores: mean squared RMS-z is 1 by construction") {
    val out = TrainingData.x57EmbedOutliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.nonEmpty)
    // Σ_v Σ_i z_vi² = n·d for biased-variance z-scores, so the mean of
    // rms_z² over vectors is exactly 1 (up to the 1e-6 quantization)
    val meanSq = out.map(t => t._3 * t._3).sum / out.length
    assert(math.abs(meanSq - 1.0) < 1e-3, s"mean rms_z^2 $meanSq")
    out.foreach { case (_, _, z, flag) => assert(flag == (z > 1.2)) }
    assert(out.map(_._1).distinct.length == out.length, "one row per vector")
  }

  test("containment pairs: truncations read 1.0 and expose the Jaccard miss") {
    val out = TrainingData.x58ContainmentDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty)
    def shingles(t: String) = t.trim.split("\\s+").toSeq
      .sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val base = Tables.documents(spark, sf)
      .filter(col("doc_id") % 1000000 < 200)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // every truncation (+3M) pairs with its base doc at containment 1.0
    val pairKeys = out.map(p => (p._1, p._2)).toSet
    base.foreach { case (id, _) =>
      assert(pairKeys.contains((id, id + 3000000L)), s"trunc pair for doc $id")
    }
    // spot-recompute every reported pair against exact sets
    val texts = (base ++
      base.map { case (id, t) => (id + 1000000L, t) } ++
      base.map { case (id, t) => (id + 2000000L, t + " extra") } ++
      base.map { case (id, t) =>
        (id + 3000000L, t.trim.split("\\s+").take(12).mkString(" ")) }).toMap
    out.foreach { case (a, b, c, j) =>
      val (sa, sb) = (shingles(texts(a)), shingles(texts(b)))
      val inter = sa.intersect(sb).size.toDouble
      assert(math.abs(c - inter / math.min(sa.size, sb.size)) < 1e-3,
        s"pair ($a,$b) containment")
      assert(math.abs(j - inter / sa.union(sb).size) < 1e-3,
        s"pair ($a,$b) jaccard")
    }
    // the family x4's symmetric threshold misses must actually appear:
    // full containment, sub-0.5 Jaccard
    assert(out.exists(p => p._3 >= 0.999 && p._4 < 0.5),
      "expected contained pairs below the Jaccard threshold")
  }

  test("dedup mass audit: per-source totals reconcile with the survivor set") {
    val out = TrainingData.x59DedupMass(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    val srcOf = Tables.documents(spark, sf)
      .filter(col("doc_id") % 1000000 < 200)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // corpus = base + exact copy + near copy per base doc
    assert(out.values.map(_._1).sum == 3L * srcOf.size, "corpus size")
    // survivor count from the end-to-end operator must match n_kept
    val survivors = TrainingData.x24DedupSurvivors(spark, sf).collect()
      .map(_.getLong(0))
    val keptBySrc = survivors.groupBy(id => srcOf(id % 1000000L))
      .view.mapValues(_.length.toLong).toMap
    out.foreach { case (src, (nDocs, nKept, tokTot, tokKept, frac)) =>
      assert(nKept == keptBySrc.getOrElse(src, 0L), s"$src n_kept")
      assert(nKept <= nDocs && tokKept <= tokTot, s"$src bounds")
      assert(math.abs(frac - tokKept.toDouble / tokTot) < 1e-3, s"$src frac")
    }
  }

  test("signature store: incremental pairs equal a fresh two-sided LSH run") {
    val inc = TrainingData.x60SignatureStore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // fresh run over old ∪ batch: cross pairs are exactly (old, new)
    // because old ids < 1M <= new ids and pairs are emitted id_a < id_b
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 1000000 < 200).select(col("doc_id"), col("text"))
    val batch = docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text")))
    val fresh = graft.dedup.NearDup
      .minhashLshPairs(docs.unionByName(batch)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a < 1000000L && b >= 1000000L }
      .map { case (a, b, j) => (b, a, j) }.toSet
    assert(inc == fresh, "store path must be bit-identical to a fresh run")
    assert(inc.nonEmpty)
  }

  test("quality sampling is pure hash thresholding, reproducible per doc") {
    val out = TrainingData.x61QualitySampling(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5)))
    val md = java.security.MessageDigest.getInstance("MD5")
    out.foreach { case (id, q, u, p, sel) =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val expU = java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
      assert(u == expU, s"doc $id u")
      assert(p == q * q && sel == (u < p), s"doc $id decision")
    }
    val kept = out.count(_._5)
    assert(kept > 0 && kept < out.length, "sampling must be non-degenerate")
  }

  test("lsh recall audit: bounded, and tracks the S-curve direction") {
    val rows = TrainingData.x62LshEval(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.length >= 4, "prefix copies should populate several bands")
    rows.foreach { case (band, nt, nf, rec, model) =>
      assert(nf <= nt && rec >= 0.0 && rec <= 1.0 && model >= 0.0 && model <= 1.0,
        s"band $band bounds")
    }
    val byBand = rows.map(t => t._1 -> t._4).toMap
    assert(byBand(0.9) > 0.95, "top band must be nearly fully recalled")
    assert(byBand(0.9) > byBand.getOrElse(0.3, 0.0),
      "recall must fall with similarity, as the S-curve predicts")
  }

  test("pmi co-occurrence matches a brute-force window count") {
    val out = TrainingData.x63PmiCooccurrence(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 100)
    val docs = Tables.documents(spark, sf).select(col("text")).collect()
      .map(_.getString(0).trim.split("\\s+").toSeq)
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    var m = 0L
    docs.foreach { toks =>
      m += toks.length
      for (i <- toks.indices; k <- 1 to 4 if i + k < toks.length) {
        val (a, b) = (toks(i), toks(i + k))
        val key = if (a <= b) (a, b) else (b, a)
        pairCounts(key) = pairCounts.getOrElse(key, 0L) + 1
      }
    }
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = pairCounts.values.sum.toDouble
    out.foreach { case (w1, w2, c, pmi) =>
      assert(pairCounts((w1, w2)) == c, s"($w1,$w2) count")
      val expected = math.log((c / n)
        / ((uni(w1) / m.toDouble) * (uni(w2) / m.toDouble)))
      assert(math.abs(pmi - expected) < 1e-3, s"($w1,$w2): $pmi vs $expected")
    }
    // the cut is the global top by PMI: nothing below the reported
    // minimum should beat it among eligible pairs
    val minReported = out.map(_._4).min
    val best = pairCounts.filter(_._2 >= 5).map { case ((a, b), c) =>
      math.log((c / n) / ((uni(a) / m.toDouble) * (uni(b) / m.toDouble)))
    }.toSeq.sorted(Ordering[Double].reverse).take(100).last
    assert(minReported >= best - 1e-3, "top-100 cut must be the true top")
  }

  test("x64 stupid-backoff hits all three branches with the right scores") {
    import spark.implicits._
    // train: "a b c d" ×3 → c1: a/b/c/d = 3 each (N=12, V=4);
    // bigrams ab/bc/cd = 3 each; trigrams abc/bcd = 3 each
    val train = Seq((100L, "a b c d"), (101L, "a b c d"), (102L, "a b c d"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (1L, "a b c"),   // trigram abc seen → branch 1: S = 3/3 = 1
      (2L, "x b c"),   // trigram unseen, bigram bc seen → 0.4·3/3 = 0.4
      (3L, "a b d"),   // tri+bigram(bd) unseen, d seen → 0.16·(3+1)/16
      (4L, "a b zz"))  // zz unknown → 0.16·(0+1)/16 = 0.01
      .toDF("doc_id", "text")
    val got = TrainingData.backoffTrigramScores(probe, train)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def q(s: Double) = BigDecimal(-math.log(s) * 1e4)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e4
    assert(got(1L) == q(1.0))
    assert(got(2L) == q(0.4))
    assert(got(3L) == q(0.16 * 4 / 16))
    assert(got(4L) == q(0.16 * 1.0 / 16))
    // backoff depth orders the surprise: seen < bigram < unigram < unk
    assert(got(1L) < got(2L) && got(2L) < got(3L) && got(3L) < got(4L))
  }

  test("x99 PQ: codebook shape, code range, ADC recall above chance") {
    val emb = Tables.embeddings(spark, sf)
    val cents = graft.ml.PqIndex.trainCodebook(emb)
    // 8 subspaces × (≤16 surviving cells) of 8-wide centroids
    val cRows = cents.collect()
    assert(cRows.length <= 8 * 16 && cRows.length >= 8 * 2)
    assert(cRows.forall(_.getSeq[Float](2).length == 8))
    val codes = graft.ml.PqIndex.encode(emb, cents)
    val n = emb.count()
    assert(codes.count() == n * 8, "one code per (vector, subspace)")
    assert(codes.agg(max(col("code")), min(col("code"))).collect()
      .forall(r => r.getInt(0) < 16 && r.getInt(1) >= 0))
    // recall@10 must beat the random-overlap baseline (~10/N) by a
    // wide margin — 32x compression loses precision, not everything
    val recall = TrainingData.defs("x99_pq_recall")(spark, sf)
      .agg(avg(col("recall_at_10"))).collect().head.getDouble(0)
    assert(recall > 0.05, s"mean ADC recall $recall at chance level")
  }

  test("x100 IVF-PQ serving: full result sets, monotone ADC, probed cells only") {
    val out = TrainingData.defs("x100_ivfpq_query")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == (0L until 5L).toSet)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to 10), s"q$q ranks")
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq,
        s"q$q ADC order")
      assert(!rows.exists(_._2 == q), s"q$q self-match")
    }
    // every returned candidate must come from one of the query's 4
    // probed coarse cells — the pruning contract (re-derive the
    // coarse assignment from the persisted store)
    val sfName = new java.io.File(sf).getName
    val stores = new java.io.File("target").listFiles()
      .filter(f => f.getName.startsWith("ivfpq_") && f.isDirectory &&
        f.getName.contains(sfName))
    assert(stores.nonEmpty)
    val store = stores.maxBy(_.lastModified).getPath
    val cells = spark.read.parquet(s"$store/cells").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val coarse = spark.read.parquet(s"$store/coarse")
    val probed = Tables.embeddings(spark, sf).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(broadcast(coarse))
      .withColumn("dq", graft.ml.PqIndex.l2q(col("qe"), col("ce")))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("dq"), col("cid"))))
      .filter(col("rk") <= 4)
      .select(col("qid"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { case (q, nid, _, _) =>
      assert(probed(q).contains(cells(nid)),
        s"q$q returned $nid from unprobed cell ${cells(nid)}")
    }
  }

  test("x104 pairing audit reports exactly the planted embedding hole") {
    val rows = TrainingData.defs("x104_pairing_audit")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    // the withheld shard is md5₃₂(vec_id) % 10 == 7 — per-source
    // missing counts must sum to exactly that, and no vector is
    // orphaned (every vec_id has its document in the fixture)
    val expectedMissing = Tables.embeddings(spark, sf)
      .filter(pmod(graft.dedup.NearDup.md5Hash32(
        col("vec_id").cast("string")), lit(10L)) === 7).count()
    assert(expectedMissing > 0, "the planted hole must exist")
    assert(rows.map(_._4).sum == expectedMissing)
    assert(rows.forall(_._6 == 0L), "no orphaned vectors in the fixture")
    rows.foreach { case (src, nDocs, nPaired, nMissing, cov, _) =>
      assert(nPaired + nMissing == nDocs, s"$src accounting")
      assert(cov > 0.6 && cov <= 1.0, s"$src coverage $cov")
    }
    // the hash hole spreads: more than half the sources are hit
    assert(rows.count(_._4 > 0) > rows.length / 2, "hole not spread")
  }

  test("x62b tuner: grid complete, hand-checked points, chosen is optimal") {
    val out = TrainingData.defs("x62b_lsh_tuner")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getBoolean(6)))
    assert(out.length == TrainingData.lshTunerGrid.size)
    val byCfg = out.map(t => (t._2, t._3) -> t).toMap
    // hand-computable S-curve points: b=1 collapses to one band
    assert(byCfg((1L, 1L))._4 == 0.5)      // 1 − (1 − 0.5) exactly
    assert(byCfg((1L, 2L))._4 == 0.25)     // 1 − (1 − 0.25)
    // catch_lo at (1,1): 1.0 − (1.0 − 0.3) = 0.3000000000000000444
    // in IEEE doubles — ABOVE 0.3, so floor-quantization keeps 0.3
    // (deterministic; the sf0.01/sf0.1 oracle runs pin DuckDB agrees)
    assert(byCfg((1L, 1L))._5 == 0.3)
    // recall is monotone in bands for fixed rows
    for (r <- 1L to 8L) {
      val hs = out.filter(_._3 == r).sortBy(_._2).map(_._4)
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b }, s"r=$r")
    }
    // exactly one chosen, it meets the constraint, and no eligible
    // config beats it on (catch_lo, cost, rows, bands) — checked from
    // the emitted table itself, independent of the model arithmetic
    val chosen = out.filter(_._7)
    assert(chosen.length == 1)
    val c = chosen.head
    assert(c._4 >= 0.9)
    val eligible = out.filter(_._4 >= 0.9)
    val key = (t: (Long, Long, Long, Double, Double, Long, Boolean)) =>
      (t._5, t._6, t._3, t._2)
    assert(eligible.forall(e => Ordering[(Double, Long, Long, Long)]
      .lteq(key(c), key(e))), s"chosen $c not optimal")
  }

  test("x83 Kneser-Ney: discount, continuation counts, and context backoff") {
    import spark.implicits._
    // train: "a b c d" ×3 → trigram types abc/bcd (c3=3 each);
    // continuation tables: ctx3(ab)=(3,1), ctx3(bc)=(3,1);
    // cc2(b,c)=cc2(c,d)=1; ccm(b)=ccm(c)=1, n1p_v=1;
    // bigram types ab/bc/cd → cc1(b)=cc1(c)=cc1(d)=1, T=3, V1=3, V=4
    val train = Seq((100L, "a b c d"), (101L, "a b c d"), (102L, "a b c d"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (1L, "a b c"),   // seen trigram: discounted ML + interpolation
      (2L, "x b c"),   // unseen context (x,b) → backs off to P2(c|b)
      (3L, "a b d"),   // seen context, unseen trigram → pure lambda·P2
      (4L, "a b zz"))  // unknown word → funded by the uniform base
      .toDF("doc_id", "text")
    val got = TrainingData.knTrigramScores(probe, train)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // replicate the engine's exact double chain (D=3/4 via max(4c−3,0))
    def p1(cc1: Long) =
      (math.max(4 * cc1 - 3, 0L) * 5 + 9).toDouble / (3L * 5 * 4).toDouble
    def p2(cc2: Long, p1v: Double) =
      (math.max(4 * cc2 - 3, 0L).toDouble + 3.0 * p1v) / 4.0
    def p3(c3: Long, p2v: Double) =
      (math.max(4 * c3 - 3, 0L).toDouble + 3.0 * p2v) / 12.0
    def q(p: Double) = BigDecimal(-math.log(p) * 1e4)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e4
    assert(got(1L) == q(p3(3, p2(1, p1(1)))))          // 0.85625
    assert(got(2L) == q(p2(1, p1(1))))                 // 0.425
    assert(got(3L) == q(p3(0, p2(0, p1(1)))))          // 0.04375
    assert(got(4L) == q(p3(0, p2(0, p1(0)))))          // 0.028125
    // surprise ordering: seen < context-backoff < unseen < unknown
    assert(got(1L) < got(2L) && got(2L) < got(3L) && got(3L) < got(4L))
  }

  test("x83 KN en-trained LM separates en docs (CCNet shape)") {
    val rows = TrainingData.defs("x83_kn_logppl")(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .groupBy(col("lang") === "en")
      .agg(avg(col("ppl3_kn")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(rows(true) < rows(false),
      s"en mean ${rows(true)} should beat non-en ${rows(false)}")
  }

  test("x83 vs x64: KN beats stupid backoff on held-out text (r7 item 2 pin)") {
    val langs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    val kn = TrainingData.defs("x83_kn_logppl")(spark, sf)
      .select(col("doc_id"), col("ppl3_kn"))
    val sb = TrainingData.defs("x64_backoff_logppl")(spark, sf)
      .select(col("doc_id"), col("ppl3_proxy"))
    val m = kn.join(sb, Seq("doc_id")).join(langs, Seq("doc_id"))
      .groupBy(col("lang") === "en")
      .agg(avg(col("ppl3_kn")).as("kn"), avg(col("ppl3_proxy")).as("sb"))
      .collect().map(r => r.getBoolean(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // held-out (non-en) text: proper Kneser-Ney smoothing assigns the
    // unseen-heavy steps more mass than stupid backoff's fixed 0.4
    val (knOut, sbOut) = m(false)
    assert(knOut < sbOut, s"held-out: KN $knOut should beat SB $sbOut")
    // in-domain the discount works against KN — SB's undiscounted ML
    // ratios win where almost every trigram is seen (sanity direction)
    val (knIn, sbIn) = m(true)
    assert(sbIn < knIn, s"in-domain: SB $sbIn should beat KN $knIn")
  }

  test("x64 en-trained LM separates en docs from the rest (CCNet shape)") {
    val rows = TrainingData.defs("x64_backoff_logppl")(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .groupBy(col("lang") === "en")
      .agg(avg(col("ppl3_proxy")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(rows(true) < rows(false),
      s"en mean ${rows(true)} should beat non-en ${rows(false)}")
  }

  test("x87 strip removes exactly the df-heavy segments x66 detects") {
    // one contract: per doc, x87's n_drop must equal x66's n_boiler,
    // and the cleaned token count must equal the un-dropped remainder
    // in 8-token units (last segment may be short — bound, not equal)
    val det = TrainingData.defs("x66_boilerplate_segments")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val strip = TrainingData.defs("x87_boilerplate_strip")(spark, sf)
      .collect()
    assert(strip.length == det.size)
    strip.foreach { r =>
      val (nSeg, nBoiler) = det(r.getLong(0))
      assert(r.getLong(1) == nSeg && r.getLong(2) == nBoiler,
        s"doc ${r.getLong(0)} drop/detect drift")
      val kept = nSeg - nBoiler
      val cleanTok = r.getLong(4)
      assert(cleanTok <= kept * 8 && (kept == 0 || cleanTok > (kept - 1) * 8),
        s"doc ${r.getLong(0)}: $cleanTok tokens vs $kept kept segments")
      assert(r.getString(3).length == 32)
    }
  }

  test("x88 keeps the best-quality doc per dup family, one per family") {
    val rows = TrainingData.defs("x88_quality_survivors")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val byFam = rows.groupBy(_._2)
    assert(byFam.forall { case (_, fam) => fam.count(_._4) == 1 },
      "exactly one kept_best per family")
    byFam.foreach { case (fam, docs) =>
      val kept = docs.find(_._4).get
      assert(docs.forall(d => d._3 < kept._3 ||
        (d._3 == kept._3 && d._1 >= kept._1)),
        s"family $fam: kept ${kept._1} not the (quality, id)-best")
    }
    // the exact +1M copies score identically to their base → min id
    // wins; the '+ extra' near copies can differ — spot-check one
    // known family has its base doc kept over the exact copy
    val exactFams = byFam.filter { case (_, d) =>
      d.exists(_._1 >= 1000000L) && d.exists(_._1 < 1000000L) }
    assert(exactFams.nonEmpty)
  }

  test("x91 precision audit: shares sum to 1, top band dominated by dups") {
    val rows = TrainingData.defs("x91_lsh_precision")(spark, sf)
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val shareSum = rows.map(_._3).sum
    assert(math.abs(shareSum - 1.0) < 1e-2, s"shares sum $shareSum")
    // exact copies put mass at band 0.9; below_threshold flags agree
    assert(rows.exists(r => r._1 == 0.9 && r._2 > 0))
    rows.foreach(r => assert(r._4 == (r._1 < 0.5)))
  }

  test("x66 boilerplate: the shared source banner is caught, bodies are not") {
    val docs = Tables.documents(spark, sf)
    val srcOf = docs.select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val srcCnt = srcOf.values.groupBy(identity).view.mapValues(_.size).toMap
    val out = TrainingData.defs("x66_boilerplate_segments")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == srcOf.size)
    out.foreach { case (id, nSeg, nBoil, frac) =>
      assert(nBoil <= nSeg && frac >= 0.0 && frac <= 1.0, s"doc $id bounds")
      // the banner's first 8-token segment is shared by every doc of
      // the source, so any doc of a df-eligible source flags it
      if (srcCnt(srcOf(id)) >= 3) assert(nBoil >= 1, s"doc $id banner missed")
    }
    // boilerplate must stay the template slice, not swallow the bodies
    val meanFrac = out.map(_._4).sum / out.length
    assert(meanFrac < 0.5, s"bodies flagged as boilerplate: $meanFrac")
  }

  test("x67 vocab growth conserves type and token mass, cumulatives run") {
    val out = TrainingData.defs("x67_vocab_growth")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty && out.length <= 10)
    var (ct, cy) = (0L, 0L)
    out.foreach { case (_, nTok, nNew, cumTok, cumTypes) =>
      ct += nTok; cy += nNew
      assert(cumTok == ct && cumTypes == cy, "cumulative columns must run")
    }
    val toks = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
    assert(out.last._4 == toks.count(), "token mass conservation")
    assert(out.last._5 == toks.distinct().count(), "type mass conservation")
    // Heaps law: the tail decile mints no more types than the head
    assert(out.last._3 <= out.head._3, "vocabulary growth should flatten")
  }

  test("x68 PSI: nonnegative per-bin contributions summing to the total") {
    val out = TrainingData.defs("x68_quality_psi")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.length == 10, "explicit decile grid")
    out.foreach { case (bin, _, _, contrib, _) =>
      assert(contrib >= 0.0, s"bin $bin: (p-q)ln(p/q) is nonnegative")
    }
    val totalQ = out.map(t => math.round(t._4 * 1e8)).sum
    out.foreach { case (_, _, _, _, psi) =>
      assert(math.round(psi * 1e8) == totalQ, "psi = sum of contributions")
    }
    // the two halves come from the same generator: no drift alarm
    assert(out.head._5 < 0.5, s"same-corpus halves should not alarm")
  }

  test("x69 prototypicality: dense in-label ranks ordered by cosine") {
    val out = TrainingData.defs("x69_prototypicality")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
    assert(out.map(_._1).distinct.length == out.length, "one row per vector")
    out.foreach { case (id, _, c, _) =>
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"vec $id cosine bounds")
    }
    out.groupBy(_._2).foreach { case (label, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length),
        s"label $label ranks not dense")
      val byRank = rows.sortBy(_._4).map(_._3)
      byRank.zip(byRank.tail).foreach { case (a, b) =>
        assert(a >= b - 1e-9, s"label $label rank order vs cosine order")
      }
    }
    // spot-check the winner against a double-precision centroid cosine
    val emb = Tables.embeddings(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).toArray.map(_.toDouble)))
    val top = out.filter(_._4 == 1).head
    val mine = emb.filter(_._2 == top._2).map(_._3)
    val centroid = mine.transpose.map(_.sum)
    val v = emb.find(_._1 == top._1).get._3
    val cos = v.zip(centroid).map { case (a, b) => a * b }.sum /
      (math.sqrt(v.map(x => x * x).sum) *
        math.sqrt(centroid.map(x => x * x).sum))
    assert(math.abs(cos - top._3) < 1e-3,
      s"quantized cosine ${top._3} vs exact $cos")
  }

  test("x70 mixture sampling: rate capped at 1, capped sources kept whole") {
    val out = TrainingData.defs("x70_mixture_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.foreach { case (s0, nDocs, tok, rate, nKept, tokKept) =>
      assert(rate > 0.0 && rate <= 1.0, s"$s0 rate bounds")
      assert(nKept <= nDocs && tokKept <= tok, s"$s0 sample bounds")
      if (rate == 1.0)
        assert(nKept == nDocs && tokKept == tok, s"$s0 must be kept whole")
    }
    // UniMax flattening: the keep-rate is B/(denom·√tok) until the cap,
    // so sorted by token mass the rates are nonincreasing
    val byTok = out.sortBy(_._3).map(_._4)
    byTok.zip(byTok.tail).foreach { case (a, b) =>
      assert(a >= b - 1e-12, "sqrt-share rate must flatten with size")
    }
  }

  test("x71 split leakage: splits partition the corpus, copies leak") {
    val out = TrainingData.defs("x71_split_leakage")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).sorted.toSeq == Seq("test", "train", "val"))
    val corpusN = Tables.documents(spark, sf)
      .filter(col("doc_id") % 1000000 < 200).count() * 3
    assert(out.map(_._2).sum == corpusN, "splits must partition the corpus")
    out.foreach { case (sp, nDocs, nLeaked, frac) =>
      assert(nLeaked <= nDocs && frac >= 0.0 && frac <= 1.0, s"$sp bounds")
    }
    // each doc has two same-text copies hashed to independent buckets:
    // the eval splits are ~fully contaminated in this fixture
    val eval_ = out.filter(t => t._1 != "train")
    assert(eval_.map(_._3).sum > 0, "cross-split copies must be caught")
  }

  test("x72 edit verification confirms the copy families with exact lev") {
    val out = TrainingData.defs("x72_edit_verify")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6)))
    assert(out.nonEmpty)
    out.foreach { case (a, b, j, lev, maxLen, rel, conf) =>
      assert(a < b && j >= 0.3, s"($a,$b) candidate contract")
      assert(lev >= 0 && lev <= maxLen && rel >= 0.0 && rel <= 1.0,
        s"($a,$b) metric bounds")
      assert(conf == (rel <= 0.2), s"($a,$b) verdict")
    }
    val byPair = out.map(t => (t._1, t._2) -> t).toMap
    Tables.documents(spark, sf).filter(col("doc_id") % 1000000 < 200)
      .select(col("doc_id")).collect().map(_.getLong(0)).take(20)
      .foreach { id =>
        // exact copy: identical text, lev 0; near copy: " extra" = +6
        val ex = byPair((id, id + 1000000L))
        assert(ex._3 == 1.0 && ex._4 == 0L && ex._7, s"doc $id exact copy")
        val nr = byPair((id, id + 2000000L))
        assert(nr._4 == 6L && nr._7, s"doc $id near copy lev")
      }
  }

  test("x73 dup-graph stats conserve edge and doc mass vs the pair list") {
    val out = TrainingData.defs("x73_dup_graph_stats")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val deg = out.filter(_._1 == "degree")
    val comp = out.filter(_._1 == "component")
    assert(deg.nonEmpty && comp.nonEmpty)
    // handshake lemma: Σ k·n(k) = 2·|pairs|; component docs ≤ graph docs
    val edgeEnds = deg.map(t => t._2 * t._3).sum
    assert(edgeEnds % 2 == 0, "degree mass must be even")
    val graphDocs = deg.map(_._3).sum
    val compDocs = comp.map(t => t._2 * t._3).sum
    // every doc in a ≥2-component has degree ≥ 1; isolated docs are in
    // neither histogram — the two doc masses must agree exactly (a CC
    // component IS a connected subgraph of the pair graph)
    assert(compDocs == graphDocs, s"component docs $compDocs vs graph $graphDocs")
    // the prefix fixture must produce non-uniform structure
    assert(deg.length >= 2 && comp.length >= 2, "histograms should have a tail")
  }

  test("x74 SQ8 recall matches a driver-side brute-force recomputation") {
    val out = TrainingData.defs("x74_sq8_recall")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 5)
    out.foreach { case (q, m, rec) =>
      assert(m >= 0 && m <= 10 && rec == m.toDouble / 10, s"query $q contract")
    }
    // brute-force both rankings on the driver for one query
    val emb = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    def quant(v: Array[Double]): Array[Long] = {
      val mx = v.map(math.abs).max
      v.map(x => math.round(x * 127 / mx))
    }
    val (qid, qv) = emb.find(_._1 == 0L).get
    def top10(score: ((Long, Array[Double])) => Double) =
      emb.filter(_._1 != qid)
        .map(n => (n._1, score(n)))
        .sortBy { case (nid, sc) => (-sc, nid) }.take(10).map(_._1).toSet
    val fTop = top10 { case (_, nv) =>
      BigDecimal(cos(qv, nv)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val qq = quant(qv)
    val qTop = top10 { case (_, nv) =>
      val nq = quant(nv)
      qq.zip(nq).map { case (a, b) => a * b }.sum.toDouble /
        (math.sqrt(qq.map(x => x * x).sum.toDouble)
          * math.sqrt(nq.map(x => x * x).sum.toDouble))
    }
    assert(out.find(_._1 == 0L).get._2 == (fTop & qTop).size,
      "engine n_match must equal the brute-force intersection")
  }

  test("x75 IVF balance: shares and imbalance reconcile with the census") {
    val out = TrainingData.defs("x75_ivf_balance")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty && out.length <= 16)
    val total = out.map(_._2).sum
    assert(total == Tables.embeddings(spark, sf).count(),
      "every vector must land in exactly one cell")
    assert(math.abs(out.map(_._3).sum - 1.0) < out.length * 1e-4,
      "shares must sum to ~1")
    val expImb = out.map(_._2).max.toDouble * out.length / total
    out.foreach { case (_, _, _, imb) =>
      assert(math.abs(imb - expImb) < 1e-3, "imbalance = max/mean")
      assert(imb >= 1.0 - 1e-9, "max cannot be below the mean")
    }
  }

  test("x76 vocab sketch: HLL estimate honors its bound on every source") {
    val out = TrainingData.defs("x76_vocab_sketch")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.nonEmpty)
    out.foreach { case (src, nTok, nTypes, ok) =>
      assert(nTypes <= nTok, s"$src: types cannot exceed tokens")
      assert(ok, s"$src: sketch estimate outside the 20% bound")
    }
  }

  test("x77 soft dedup conserves corpus mass through the weights") {
    val out = TrainingData.defs("x77_soft_dedup_weights")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val corpusN = Tables.documents(spark, sf)
      .filter(col("doc_id") % 1000000 < 200).count() * 3
    // weights must re-total to the pre-dedup corpus: nothing lost,
    // duplication frequency preserved as multiplicity
    assert(out.map(_._2).sum == corpusN, "Σ peso = corpus size")
    out.foreach { case (id, w, lw) =>
      assert(w >= 1, s"doc $id weight")
      assert(math.abs(lw - math.log(w.toDouble + 1)) < 1e-5, s"doc $id log")
    }
    // survivors are exactly the x24 survivor set
    val survivors = TrainingData.defs("x24_dedup_survivors")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet == survivors, "one weighted row per survivor")
  }

  test("x78 Gopher rules discriminate and reconcile with a recomputation") {
    val out = TrainingData.defs("x78_gopher_rules")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.nonEmpty)
    out.foreach { case (id, nw, ml, af, _, _) =>
      assert(nw > 0 && ml > 0 && af >= 0.0 && af <= 1.0, s"doc $id bounds")
    }
    // the bundle must actually separate docs on this corpus
    assert(out.exists(_._6) && out.exists(!_._6), "pass/fail mix expected")
    // recompute every predicate for a sample of docs
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.take(25).foreach { case (id, nw, _, _, nStop, passes) =>
      val toks = docs(id).trim.split("\\s+")
      assert(nw == toks.length, s"doc $id word count")
      val nch = toks.map(_.length.toLong).sum
      // mirror the engine's ASCII-letter class exactly (not isLetter)
      val na = toks.count(_.exists(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
      val ns = toks.count(_.exists(c => c == '#' || c == '…')).toLong
      val stops = toks.distinct.count(Set("the", "a", "of", "and")).toLong
      assert(nStop == stops, s"doc $id stopword count")
      val exp = toks.length >= 50 && toks.length <= 100000 &&
        nch >= 3L * toks.length && nch <= 10L * toks.length &&
        na * 5 >= 4L * toks.length && ns * 10 <= toks.length &&
        stops >= 2
      assert(passes == exp, s"doc $id verdict")
    }
  }

  test("x79 lang margin agrees with x7's decision, flags ambiguity") {
    val out = TrainingData.defs("x79_lang_margin")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
    val x7 = TrainingData.defs("x7_lang_id")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, lang, margin, amb) =>
      assert(lang == x7(id), s"doc $id: route must equal x7's decision")
      assert(margin >= 0.0, s"doc $id margin sign")
      assert(amb == (margin == 0.0), s"doc $id ambiguity flag")
    }
    assert(out.exists(!_._4), "confident routes must exist")
  }

  test("x80 quality trend matches a driver-side exact-moment OLS") {
    val out = TrainingData.defs("x80_quality_trend")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(out.nonEmpty)
    val docs = TrainingData.defs("x8_quality_score")(spark, sf)
      .join(Tables.documents(spark, sf).select("doc_id", "source"), Seq("doc_id"))
      .select("source", "doc_id", "quality").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    out.take(5).foreach { case (src, n, mq, trend, deg) =>
      assert(mq >= 0.0 && mq <= 1.0, s"$src mean bounds")
      val rows = docs.filter(_._1 == src)
        .map(t => (BigInt(t._2), BigInt(math.round(t._3 * 1e4))))
      assert(rows.length == n, s"$src doc count")
      val (sx, sxx) = (rows.map(_._1).sum, rows.map(t => t._1 * t._1).sum)
      val (sy, sxy) = (rows.map(_._2).sum, rows.map(t => t._1 * t._2).sum)
      val num = BigInt(n) * sxy - sx * sy
      val den = BigInt(n) * sxx - sx * sx
      val trendQ = {
        val a = num * 100
        val s0 = if (a < 0) -1 else 1
        s0 * ((2 * a.abs + den) / (2 * den))
      }
      assert(math.abs(trend - trendQ.toDouble / 1e3) < 1e-9, s"$src slope")
      assert(deg == (trendQ < -10), s"$src flag")
    }
  }

  test("x81 corpus card: checksum is order-free, entropy bounded, mass exact") {
    val out = TrainingData.defs("x81_corpus_card")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))
    assert(out.nonEmpty)
    val nLangs = Tables.documents(spark, sf).select("lang").distinct().count()
    out.foreach { case (src, nDocs, nTok, nBytes, mq, dup, ent, _) =>
      assert(nDocs > 0 && nTok > 0 && nBytes >= nTok, s"$src volume sanity")
      assert(mq >= 0.0 && mq <= 1.0 && dup >= 0.0 && dup <= 1.0, s"$src rates")
      assert(ent >= 0.0 && ent <= math.log(nLangs.toDouble) / math.log(2.0)
        + 1e-6, s"$src entropy ≤ log2(|langs|)")
    }
    // recompute one source's checksum on the driver in a DIFFERENT
    // order — the order-free contract is what makes it a corpus id
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s0: String): Long = {
      val hex = md.digest(s0.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val src0 = out.head._1
    val fps = Tables.documents(spark, sf).filter(col("source") === src0)
      .select(lower(trim(col("text"))).as("t")).collect()
      .map(r => h32(md.digest(r.getString(0).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString))
    assert(fps.sorted.sum == out.head._8, s"$src0 checksum")
  }

  test("x82 percentile normalizes quality within each source") {
    val out = TrainingData.defs("x82_quality_percentile")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (src, rows) =>
      rows.foreach { case (id, _, _, p, keep) =>
        assert(p >= 0.0 && p <= 1.0 && keep == (p >= 0.25), s"doc $id")
      }
      // the source's worst doc sits at 0; the top GROUP sits at
      // (first-index-of-max)/(n−1) — 1.0 exactly when the max is
      // unique, lower when tied (SQL percent_rank tie semantics)
      val byQ = rows.sortBy(_._3)
      val topStart = byQ.indexWhere(_._3 == byQ.last._3)
      assert(byQ.head._4 == 0.0, s"$src floor")
      assert(byQ.last._4 == topStart.toDouble / (rows.length - 1),
        s"$src top-group rank")
      byQ.zip(byQ.tail).foreach { case (a, b) =>
        assert(a._4 <= b._4 + 1e-12, s"$src monotone")
        if (a._3 == b._3) assert(a._4 == b._4, s"$src ties share a rank")
      }
      // ~75% of each source survives the global p25 knob
      val kept = rows.count(_._5).toDouble / rows.length
      assert(kept >= 0.6 && kept <= 0.9, s"$src keep fraction $kept")
    }
  }

  test("x106 BPE trainer: merge sequence pinned on a crafted micro-vocab") {
    import graft.text.Bpe
    // vocab: aaa×2, ab×3, ba×3.
    // step1: (a,a) cnt 4 (two overlapping slots × freq 2) beats the 3s;
    //        GREEDY LEFT-TO-RIGHT: aaa → [aa, a] (never [a, aa])
    // step2: (a,b) vs (b,a) tie at 3 → lhs byte-order picks (a,b)
    // step3: (b,a) 3       step4: (aa,a) 2 — proves step1 merged left-first
    // step5: every word is a single symbol → early exhaustion at 4 < k
    val merges = Bpe.trainOnVocab(Seq(("aaa", 2L), ("ab", 3L), ("ba", 3L)), 50)
    assert(merges.map(m => (m.step, m.lhs, m.rhs, m.pairFreq)) == Seq(
      (1, "a", "a", 4L), (2, "a", "b", 3L), (3, "b", "a", 3L),
      (4, "aa", "a", 2L)))
  }

  test("x107 BPE segmentation Column ≡ driver replica (greedy overlap cases)") {
    import spark.implicits._
    import graft.text.Bpe
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val words = Seq("aaaa", "aaa", "abab", "aab", "aaab", "x", "ba", "aaaab")
    val got = Bpe.segmentDict(words.toDF("w"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    words.foreach { w =>
      assert(got(w) == Bpe.segmentWord(w, merges), s"word $w")
    }
    // the canonical overlap pins, explicitly:
    assert(got("aaaa") == Vector("aa", "aa"))      // alternate runs from left
    assert(got("aaa") == Vector("aa", "a"))        // left-first, not [a, aa]
    assert(got("aaab") == Vector("aaab"))          // (a,a) → (a,b) → (aa,ab)
    assert(got("aaaab") == Vector("aa", "aa", "b")) // run merged, b stranded
  }

  test("x106/x107 on the corpus: lossless segmentation, fertility bounds") {
    val merges = TrainingData.trainBpeMerges(spark, sf)
    assert(merges.nonEmpty && merges.map(_.step) == (1 to merges.length))
    // replaying the merges must reconstruct every distinct corpus word
    val sw = Tables.documents(spark, sf)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct()
    val dict = graft.text.Bpe.segmentDict(sw, merges.map(m => (m.lhs, m.rhs)))
      .select(col("w"), concat_ws("", col("syms")).as("rebuilt"),
        size(col("syms")).as("n_sub"))
      .collect()
    assert(dict.nonEmpty)
    dict.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"lossy: ${r.getString(0)}")
      assert(r.getInt(2) >= 1 && r.getInt(2) <= r.getString(0).length)
    }
    // learned-vocab fertility strictly beats character-level (= word length)
    val fert = TrainingData.defs("x107_bpe_segment")(spark, sf).collect()
    fert.foreach { r =>
      val (nw, nsub, nsingle) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nsub >= nw && nsingle <= nw && r.getDouble(4) >= 1.0)
    }
  }

  test("x99b OPQ: allocation beats natural PQ on crafted correlated data") {
    import spark.implicits._
    import graft.ml.{Opq, PqIndex}
    // 40 vectors, d=16: dims 0-7 carry ±1 signal, dims 8-15 ~0.01
    // noise — natural order stacks ALL the variance into subspace 0,
    // which a k=4 codebook cannot absorb; eigenvalue allocation
    // splits the 8 strong directions 4/4 across the two subspaces.
    def h(i: Int, j: Int): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$i:$j").take(8), 16)
    val vecs = (0 until 40).map { i =>
      (i.toLong,
        ((0 until 8).map(j => if (h(i, j) % 2 == 0) 1.0 else -1.0) ++
          (8 until 16).map(j => ((h(i, j) % 100) - 50) / 5000.0)).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    def distortion(e: org.apache.spark.sql.DataFrame): Long = {
      val cents = PqIndex.trainCodebook(e, m = 2, dsub = 8, k = 4)
      PqIndex.subvectors(e, 2, 8)
        .join(broadcast(cents), Seq("m"))
        .withColumn("dq", PqIndex.l2q(col("sub"), col("ce")))
        .groupBy(col("vec_id"), col("m"))
        .agg(min(col("dq")).as("best"))
        .agg(sum(col("best"))).collect()(0).getLong(0)
    }
    def recallSum(e: org.apache.spark.sql.DataFrame): Long = {
      val cents = PqIndex.trainCodebook(e, m = 2, dsub = 8, k = 4)
      val codes = PqIndex.encode(e, cents, m = 2, dsub = 8)
      val nce = codes.as("cd").join(broadcast(cents.as("ct")),
          col("cd.m") === col("ct.m") && col("cd.code") === col("ct.cid"))
        .select(col("cd.vec_id").as("nid"), col("cd.m").as("m"),
          col("ct.ce").as("ce"))
      val qs = PqIndex.subvectors(e.filter(col("vec_id") < 5), 2, 8)
        .select(col("vec_id").as("qid"), col("m"), col("sub").as("qsub"))
      val adc = nce.join(broadcast(qs), Seq("m"))
        .filter(col("qid") =!= col("nid"))
        .withColumn("dq", PqIndex.l2q(col("qsub"), col("ce")))
        .groupBy(col("qid"), col("nid")).agg(sum(col("dq")).as("adc_q"))
      val ex = e.select(col("vec_id").as("nid"), col("embedding").as("ne"))
        .crossJoin(broadcast(e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))))
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"), PqIndex.l2q(col("qe"), col("ne")).as("ex_q"))
      import org.apache.spark.sql.expressions.Window
      val rf = Window.partitionBy(col("qid")).orderBy(col("ex_q"), col("nid"))
      val rq = Window.partitionBy(col("qid")).orderBy(col("adc_q"), col("nid"))
      ex.join(adc, Seq("qid", "nid"))
        .withColumn("rf", row_number().over(rf))
        .withColumn("rq", row_number().over(rq))
        .filter(col("rf") <= 10 && col("rq") <= 10)
        .count()
    }
    val (mat, _, _) = Opq.covariance(df)
    val rows = Opq.rotationRows(Opq.eigensolve(mat, 16), m = 2, dsub = 8)
    val rot = df.select(col("vec_id"),
      Opq.rotateCol(col("embedding"), rows).as("embedding")).localCheckpoint()
    // rotation preserves the signal: 8 large eigenvalues land 4/4
    val dPq = distortion(df); val dOpq = distortion(rot)
    assert(dOpq < dPq, s"distortion: OPQ $dOpq should beat PQ $dPq")
    val rPq = recallSum(df); val rOpq = recallSum(rot)
    assert(rOpq >= rPq, s"recall: OPQ $rOpq should be >= PQ $rPq")
  }

  test("x109 frozen-quantizer add: union assignment ≡ base ∪ batch") {
    import graft.ml.IvfIndex
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") % 10 =!= 7)
    val batch = emb.filter(col("vec_id") % 10 === 7)
    val idx = IvfIndex.build(base, nCells = 16, lloydIters = 2)
    def asg(df: org.apache.spark.sql.DataFrame) =
      IvfIndex.assign(df, idx.centroids).select(col("vec_id"), col("cell"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // assignment is row-local under a frozen quantizer: adding the
    // batch neither moves base cells nor depends on arrival grouping
    assert(asg(emb) == asg(base) ++ asg(batch))
    // and the store's own inverted file IS the base assignment
    assert(idx.cells.select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == asg(base))
  }

  test("x110 base-only store: build excludes the batch; frozen-codebook encode covers every batch id; audit totals reconcile") {
    import graft.ml.PqIndex
    val p = TrainingData.ensureIvfPqBase(spark, sf)
    val coarse = spark.read.parquet(s"$p/coarse")
    val pqc = spark.read.parquet(s"$p/pqcents")
    val emb = Tables.embeddings(spark, sf)
    val batch = emb.filter(col("vec_id") % 10 === 7)
    val nBase = emb.filter(col("vec_id") % 10 =!= 7).count()
    val nBatch = batch.count()
    // the held-out design the round-10 verdict asked for: the store
    // was trained and encoded with the batch slice EXCLUDED
    val stored = spark.read.parquet(s"$p/codes")
    assert(stored.filter(col("vec_id") % 10 === 7).count() == 0,
      "base store must contain no batch id")
    assert(stored.select("vec_id").distinct().count() == nBase)
    // frozen-codebook add: the batch encodes deterministically and
    // completely under codebooks that never saw it
    val assigned = PqIndex.assign(PqIndex.subvectors(batch, 1, 64), coarse)
    val resEmb = assigned.as("a").join(broadcast(coarse.as("c")),
        col("a.m") === col("c.m") && col("a.cell") === col("c.cid"))
      .select(col("a.vec_id").as("vec_id"),
        zip_with(col("a.sub"), col("c.ce"),
          (x, y) => (x.cast("double") - y.cast("double")).cast("float"))
          .as("embedding"))
    val fresh = PqIndex.encode(resEmb, pqc)
    assert(fresh.select("vec_id").distinct().count() == nBatch)
    // carrier totals reconcile with the slice sizes per subspace
    val rows = TrainingData.defs("x110_ivfpq_addbatch")(spark, sf).collect()
    val byM = rows.groupBy(_.getAs[Long]("m"))
    byM.values.foreach { g =>
      assert(g.map(_.getAs[Long]("n_base")).sum == nBase)
      assert(g.map(_.getAs[Long]("n_add")).sum == nBatch)
    }
  }

  test("x111 alignment sweep: one curve per source, monotone, x104-consistent") {
    val rows = TrainingData.defs("x111_alignment_score")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val x104 = TrainingData.defs("x104_pairing_audit")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, curve) =>
      val byT = curve.sortBy(_._2)
      assert(byT.map(_._2).toSeq == Seq(-0.05, -0.02, 0.0, 0.02, 0.05))
      // n_pairs is threshold-independent; n_pass decays as the cut rises
      assert(byT.map(_._3).distinct.length == 1, s"$src n_pairs varies")
      byT.zip(byT.tail).foreach { case (a, b) =>
        assert(a._4 >= b._4, s"$src pass count must be monotone")
      }
      byT.foreach { case (_, _, np, ps, rate) =>
        assert(ps >= 0 && ps <= np && rate >= 0.0 && rate <= 1.0)
      }
      // scored pairs are a subset of the docs x104 counts for the source
      assert(byT.head._3 <= x104(src), s"$src pairs exceed doc count")
    }
  }

  test("x108 classifier trainer: crafted separable set and corpus gate") {
    import spark.implicits._
    // crafted micro-set: class 1 fires feature 0, class 0 fires
    // feature 1, bias at 2 — GD must find w0 > 0 > w1 and separate
    val rows =
      (0 until 5).map(i => (i.toLong, 1L, Seq(1.0, 0.0, 1.0))) ++
      (5 until 10).map(i => (i.toLong, 0L, Seq(0.0, 1.0, 1.0)))
    val tf = rows.toDF("doc_id", "y", "xs")
    val w = TrainingData.trainQualityClf(tf, 10, dFeat = 3)
    assert(w(0) > 0 && w(1) < 0, s"signs: ${w.toSeq}")
    assert(w(0) > w(2) && w(2) > w(1), s"bias between: ${w.toSeq}")
    // every crafted doc classified correctly by the learned model
    assert(w(0) + w(2) > 0 && w(1) + w(2) <= 0)
    // corpus: the distilled model must beat the majority base rate
    val (ctf, n) = TrainingData.qualityClfTf(spark, sf)
    val cw = TrainingData.trainQualityClf(ctf, n)
    val byDoc = ctf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2)))
    val acc = byDoc.count { case (_, y, xs) =>
      val z = xs.zipWithIndex.map { case (x, b) => cw(b) * x }.sum
      (z > 0) == (y == 1L)
    }
    val base = math.max(byDoc.count(_._2 == 1L), byDoc.count(_._2 == 0L))
    assert(acc > base, s"accuracy $acc must beat base $base of ${byDoc.size}")
  }

  test("x113 CCNet buckets: per-lang terciles, ordered by perplexity") {
    val rows = TrainingData.defs("x113_ppl_buckets")(spark, sf)
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val n = docs.length
      val by = docs.groupBy(_._3).view.mapValues(_.map(_._2).toSeq).toMap
      // every bucket's worst head ppl ≤ best middle ≤ best tail
      for (h <- by.get("head"); m <- by.get("middle"))
        assert(h.max <= m.min, s"$lang head/middle overlap")
      for (m <- by.get("middle"); t <- by.get("tail"))
        assert(m.max <= t.min, s"$lang middle/tail overlap")
      // nearest-rank terciles: head holds at least ⌈n/3⌉ docs (ties
      // can grow a bucket, never shrink the cumulative thirds)
      val nh = by.getOrElse("head", Seq.empty[Double]).size
      val nm = by.getOrElse("middle", Seq.empty[Double]).size
      assert(nh * 3 >= n, s"$lang head $nh of $n")
      assert((nh + nm) * 3 >= 2 * n, s"$lang head+middle of $n")
    }
  }

  test("x116 CDC chunks re-synchronize after an insertion; fixed segments lose everything") {
    import spark.implicits._
    // one token inserted at the front: every fixed 8-token window
    // shifts (zero shared fingerprints), but content-defined
    // boundaries re-align at the first hash boundary past the edit
    val a = (1 to 150).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, a), (2L, "zzz " + a)).toDF("doc_id", "text")
    val fps = TrainingData.cdcChunkRows(docs).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(2)).toSet).toMap
    val shared = fps(1L).intersect(fps(2L))
    assert(shared.nonEmpty,
      s"CDC must re-sync (|A|=${fps(1L).size}, |B|=${fps(2L).size})")
    def fixedFps(text: String) =
      text.split(" ").grouped(8).map(_.mkString(" ")).toSet
    assert(fixedFps(a).intersect(fixedFps("zzz " + a)).isEmpty)
  }

  test("x115 frozen-vocab drift: OOV fires, fertility degrades vs self-trained") {
    val drift = TrainingData.defs("x115_bpe_drift")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(drift.nonEmpty)
    drift.foreach { case (src, (nw, noov, fert, oov)) =>
      // the frozen top-16 vocabulary must miss live words (the whole
      // point of the drift monitor) but never all of them
      assert(noov > 0 && noov < nw, s"$src oov count $noov of $nw")
      assert(oov > 0.0 && oov < 1.0 && fert >= 1.0, s"$src rates")
    }
    // same sources under the full self-trained vocab (x107): the
    // frozen tight tokenizer can only be as good or worse
    val self = TrainingData.defs("x107_bpe_segment")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    drift.foreach { case (src, (_, _, fert, _)) =>
      assert(fert >= self(src), s"$src frozen $fert vs self ${self(src)}")
    }
  }

  test("x114 OPQ serving store: frozen rotation, full top-10 per query") {
    val path = TrainingData.ensureOpqPqStore(spark, sf)
    // the persisted rotation is the serving contract: square, and
    // bit-identical to a fresh driver-side recompute
    val stored = spark.read.parquet(s"$path/rot").orderBy(col("o"))
      .collect().map(_.getSeq[Double](1).toArray)
    assert(stored.length == 64 && stored.forall(_.length == 64))
    val (mat, _, _) = graft.ml.Opq.covariance(Tables.embeddings(spark, sf))
    val fresh = graft.ml.Opq.rotationRows(
      graft.ml.Opq.eigensolve(mat, mat.length), m = 8, dsub = 8)
    stored.zip(fresh).foreach { case (a, b) => assert(a.sameElements(b)) }
    val rows = TrainingData.defs("x114_opq_serve")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    // 5 queries × a full ADC top-10 each, ranks dense from 1
    assert(rows.length == 50)
    rows.groupBy(_._1).foreach { case (_, rks) =>
      assert(rks.map(_._2).sorted.toSeq == (1 to 10))
    }
  }

  test("x112 first-occurrence survivor on a crafted duplicate pair") {
    import spark.implicits._
    // banner = 13 tokens, so with 3 pad tokens the 8-token windows
    // x1..x8 land segment-aligned (segments 2 and 3 of the stream)
    val x = (1 to 8).map(i => s"x$i").mkString(" ")
    val y = (1 to 8).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      (1L, "s", s"p1 p2 p3 $x $x"),   // within-doc dup: 2nd x-window drops
      (2L, "s", s"p1 p2 p3 $x $y"))   // shares banner+pad+x with doc 1
      .toDF("doc_id", "source", "text")
    val got = TrainingData.firstOccDedup(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    // doc 1: 4 segments, only the repeated x-window drops; doc 2 keeps
    // nothing but its unique y-window (first occurrences all live in doc 1)
    assert(got(1L)._1 == 4 && got(1L)._2 == 1)
    assert(got(2L)._1 == 4 && got(2L)._2 == 3)
    assert(got(2L)._3 == org.apache.commons.codec.digest.DigestUtils.md5Hex(y))
    assert(got(2L)._4 == 8L)
    // kept text of doc 1 = 32-token stream minus the 8-token dup window
    assert(got(1L)._4 == 24L)
  }

  test("x118 calibration: bins partition the scored corpus, means sit inside their bin, store ≡ fresh training") {
    val rows = TrainingData.defs("x118_clf_calibration")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // bins partition exactly the trainer's scored population
    val (tf, n) = TrainingData.qualityClfTf(spark, sf)
    assert(rows.map(_._2).sum == n)
    tf.unpersist()
    rows.foreach { case (bin, nd, mp, pr, gap) =>
      assert(bin >= 0 && bin <= 9 && nd > 0)
      // the mean of a bin's predictions cannot leave the bin
      assert(mp >= bin / 10.0 - 1e-9 && mp <= (bin + 1) / 10.0 + 1e-9,
        s"bin $bin mean_pred $mp outside its decile")
      assert(pr >= 0.0 && pr <= 1.0)
      assert(math.abs(gap - math.abs(mp - pr)) < 2e-6)
    }
    // the registry copy is the fresh training, bit-for-bit at 6dp
    val stored = spark.read
      .parquet(TrainingData.ensureClfWeights(spark, sf))
      .collect().map(r => r.getLong(0) ->
        BigDecimal(r.getDouble(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .toMap
    val fresh = TrainingData.defs("x108_quality_classifier")(spark, sf)
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))).toMap
    assert(stored.keySet == fresh.keySet)
    fresh.foreach { case (b, w) =>
      assert((stored(b) - w).abs <= BigDecimal("0.000001"),
        s"bucket $b: store ${stored(b)} vs fresh $w") }
  }

  test("x119 semantic leakage: val/test rows, cell-bounded count ≤ brute-force count") {
    val rows = TrainingData.defs("x119_semantic_leakage")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("val", "test"))
    // brute truth without the cell bound: a superset of x119's
    // candidates, so per split n_leaked(brute) ≥ n_leaked(x119)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        pmod(conv(substring(md5(col("vec_id").cast("string")), 1, 4), 16, 10)
          .cast("long"), lit(100L)).as("b"))
    val ev = emb.filter(col("b") >= 90)
      .select(when(col("b") < 95, "val").otherwise("test").as("split"),
        col("vec_id").as("id_e"), col("embedding").as("ee"))
    val tr = emb.filter(col("b") < 90)
      .select(col("vec_id").as("id_t"), col("embedding").as("et"))
    val brute = ev.crossJoin(tr)
      .filter(round(graft.functions.VectorExpressions
        .cosineSim(col("ee"), col("et")), 4) >= 0.4)
      .groupBy(col("split"))
      .agg(countDistinct(col("id_e")).as("nl"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (split, (nDocs, nLeaked, pairs)) =>
      assert(nLeaked <= nDocs && pairs >= nLeaked)
      assert(nLeaked <= brute.getOrElse(split, 0L),
        s"$split: cell-bounded $nLeaked exceeds brute ${brute.get(split)}")
    }
  }

  test("x120 hard negatives: family exclusion holds, ranking is contiguous and monotone") {
    val labels = TrainingData.defs("x35_semantic_dedup")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = TrainingData.defs("x120_hard_negatives")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (anchor, _, neg, _) =>
      assert(anchor % 100 == 3)
      assert(labels(anchor) != labels(neg),
        s"negative $neg shares anchor $anchor's near-dup family " +
          s"${labels(anchor)} — a mislabeled positive")
    }
    rows.groupBy(_._1).foreach { case (a, rs) =>
      val byRk = rs.sortBy(_._2)
      assert(byRk.map(_._2).toList == (1L to byRk.size).toList,
        s"anchor $a ranks")
      assert(byRk.map(_._4).toSeq.sliding(2).forall {
        case Seq(x, y) => x >= y; case _ => true }, s"anchor $a cos order")
    }
  }

  test("x121 pack boundary audit reconciles with x25's packing report") {
    val packs = TrainingData.defs("x25_pack_sequences")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    val audit = TrainingData.defs("x121_pack_boundary")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(5)))
    assert(audit.nonEmpty)
    val bySource = packs.groupBy(_._1)
    audit.foreach { case (src, nSeqs, nSegs, maxDocs, crossFrac) =>
      val ps = bySource(src)
      assert(nSeqs == ps.size, s"$src sequence count")
      assert(nSegs == ps.map(_._2).sum, s"$src segment mass")
      assert(maxDocs == ps.map(_._2).max, s"$src max docs")
      assert(crossFrac >= 0.0 && crossFrac <= 1.0)
      // a sequence holding >1 doc forces a nonzero cross fraction
      if (maxDocs > 1) assert(crossFrac > 0.0, s"$src cross_frac")
    }
  }

  test("x117 Viterbi dictionary ≡ reference DP on every fixture word; optimal where greedy is not") {
    import spark.implicits._
    // reference DP (score DESC, pieces ASC) over the same piece scores
    def refDp(w: String, sc: Map[String, Long]): (Long, Long) = {
      val L = w.length
      val s = Array.fill(L + 1)(Long.MinValue)
      val np = Array.fill(L + 1)(0L)
      s(0) = 0
      for (i <- 1 to L; j <- math.max(0, i - 4) until i)
        if (s(j) != Long.MinValue)
          sc.get(w.substring(j, i)).foreach { q =>
            val s2 = s(j) + q; val n2 = np(j) + 1
            if (s2 > s(i) || (s2 == s(i) && n2 < np(i))) { s(i) = s2; np(i) = n2 }
          }
      (np(L), s(L))
    }
    def greedy(w: String, sc: Map[String, Long]): Long = {
      var pos = 0; var tot = 0L
      while (pos < w.length) {
        val l = (4 to 1 by -1).find(l =>
          pos + l <= w.length && sc.contains(w.substring(pos, pos + l))).get
        tot += sc(w.substring(pos, pos + l)); pos += l
      }
      tot
    }
    // 1) fixture-wide: the Column-expression DP is the reference DP
    val docs = Tables.documents(spark, sf)
    val scores = TrainingData.unigramPieceScores(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dict = TrainingData.viterbiDict(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(dict.nonEmpty)
    dict.foreach { case (w, np, wq) =>
      val (rnp, rwq) = refDp(w, scores)
      assert((np, wq) == (rnp, rwq), s"word '$w': got ($np,$wq) ref ($rnp,$rwq)")
      assert(wq >= greedy(w, scores), s"word '$w': Viterbi below greedy")
    }
    // 2) crafted corpus where greedy longest-match is provably wrong:
    // 'abcd' exists as a rare whole word, so greedy eats all 4 chars;
    // the frequent 'ab'+'cd' split scores strictly higher
    val crafted = Seq((1L, ("ab " * 50) + ("cd " * 50) + "abcd"))
      .toDF("doc_id", "text")
    val csc = TrainingData.unigramPieceScores(crafted)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cd = TrainingData.viterbiDict(crafted)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (np4, wq4) = cd("abcd")
    assert(np4 == 2L, s"'abcd' should split as ab|cd, got $np4 pieces")
    assert(wq4 == csc("ab") + csc("cd"))
    assert(wq4 > greedy("abcd", csc),
      "crafted case must separate Viterbi from greedy longest-match")
  }

  test("x117 per-source report: fertility and NLL invariants") {
    val rows = TrainingData.defs("x117_unigram_viterbi")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nw, npc, fert, nll) =>
      assert(nw > 0 && npc >= nw, s"$src piece mass")
      // 1-4-char pieces on ≤16-char words bound fertility to [1, 16]
      assert(fert >= 1.0 && fert <= 16.0, s"$src fertility $fert")
      assert(nll > 0.0, s"$src NLL must be positive")
    }
  }

  test("x122 filter application: funnel reconciles with the scored population, distillation agrees with the rule gate") {
    val rows = TrainingData.defs("x122_clf_filter")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val (tf, n) = TrainingData.qualityClfTf(spark, sf)
    assert(rows.map(_._2).sum == n, "per-source docs must cover every scored doc")
    tf.unpersist()
    rows.foreach { case (src, nd, nk, kr, na) =>
      assert(nk <= nd && na <= nd, s"$src funnel bounds")
      assert(kr >= 0.0 && kr <= 1.0)
    }
    // the distilled model must agree with its teacher rule gate on
    // most of the corpus (x108's beats-base-rate pin, applied end-to-end)
    val agree = rows.map(_._5).sum.toDouble / rows.map(_._2).sum
    assert(agree > 0.5, s"corpus-level model-vs-rule agreement $agree")
  }

  test("x123 scaling curve: monotone in merge depth, k=50 ≡ x107, staged ≡ prefix replay") {
    val rows = TrainingData.defs("x123_bpe_scaling")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val byK = rs.sortBy(_._2)
      assert(byK.map(_._2).toList == List(10L, 25L, 50L), s"$src stages")
      assert(byK.map(_._3).distinct.size == 1, s"$src word mass varies")
      // merges only ever merge: deeper vocab never emits MORE subwords
      assert(byK.map(_._4).toList == byK.map(_._4).toList.sorted.reverse,
        s"$src fertility not monotone: ${byK.map(_._4)}")
    }
    // the curve's k=50 endpoint IS x107's report
    val x107 = TrainingData.defs("x107_bpe_segment")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.filter(_._2 == 50L).foreach { case (src, _, nw, nsub) =>
      assert((nw, nsub) == x107(src), s"$src k=50 disagrees with x107")
    }
    // staged snapshots ≡ an independent prefix replay at k=10
    val merges = TrainingData.trainBpeMerges(spark, sf).map(m => (m.lhs, m.rhs))
    val words = Tables.documents(spark, sf)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct()
    val staged = graft.text.Bpe.segmentDictStaged(words, merges, Seq(10))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val prefix = graft.text.Bpe.segmentDict(words, merges.take(10))
      .select(col("w"), size(col("syms")).cast("long").as("ns"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(staged == prefix, "snapshot at depth 10 must equal a fresh 10-merge replay")
  }

  test("x124 b-bit minwise: low-bit agreement dominates full agreement; exact copies read zero error") {
    import spark.implicits._
    val rows = TrainingData.defs("x124_bbit_minhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (band, np, saf, sab, ef, eb) =>
      assert(band >= 0 && band <= 9 && np > 0)
      // equal 32-bit slots have equal low bits — never the reverse
      assert(sab >= saf, s"band $band: b-bit agreement $sab < full $saf")
      assert(ef >= 0.0 && eb >= 0.0 && ef <= 1.1 && eb <= 1.1)
    }
    // two identical docs: one candidate pair, all 16 slots agree at
    // both widths, both estimators exact (J = 1, error 0)
    val twin = Seq((1L, "p q r s t u v w x y z"), (2L, "p q r s t u v w x y z"))
      .toDF("doc_id", "text")
    val p = graft.dedup.NearDup.bbitCandidateAgreement(twin).collect()
    assert(p.length == 1)
    val r = p.head
    assert(r.getAs[Long]("inter") == r.getAs[Long]("unn"))
    assert(r.getAs[Long]("agree_full") == 16L && r.getAs[Long]("agree_b") == 16L)
  }

  test("x125 JL projection: unbiased distortion, ordered spread, bounded recall") {
    val rows = TrainingData.defs("x125_jl_projection")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (qid, nm, rec, mean, mn, mx) =>
      assert(nm >= 0 && nm <= 10)
      assert(math.abs(rec - nm / 10.0) < 1e-9)
      assert(mn <= mean + 1e-9 && mean <= mx + 1e-9, s"q$qid spread order")
      // E[ratio] = 1 for ±1 rows; a per-query mean outside [0.5, 2]
      // would mean the sign matrix or the scaling is wrong, not noise
      assert(mean > 0.5 && mean < 2.0, s"q$qid ratio_mean $mean")
      assert(mn >= 0.0)
    }
  }

  test("x126 winnowing: window guarantee on every fixture doc, shared-run detection, copies stay connected") {
    import spark.implicits._
    val w = 4
    // every w consecutive k-grams contain a selection (the winnowing
    // density guarantee), checked on every fixture doc's sel array
    val wf = graft.dedup.NearDup.winnowedFingerprints(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")))
      .collect()
    assert(wf.nonEmpty)
    wf.foreach { r =>
      val m = r.getAs[Long]("m")
      val sel = r.getAs[scala.collection.Seq[Int]]("sel").map(_.toLong)
      assert(sel.nonEmpty && sel.head <= w, s"doc ${r.getLong(0)} head")
      assert(sel.last >= m - w + 1, s"doc ${r.getLong(0)} tail")
      sel.sliding(2).foreach {
        case scala.collection.Seq(a, b) =>
          assert(b - a <= w, s"doc ${r.getLong(0)} gap $a→$b")
        case _ => ()
      }
    }
    // the MOSS guarantee: two docs sharing a run of ≥ w+k−1 = 6 tokens
    // share a winnowed fingerprint, however the run is aligned
    val shared = "s1 s2 s3 s4 s5 s6"
    val pair = Seq(
      (1L, s"alpha beta gamma delta $shared epsilon zeta"),
      (2L, s"one $shared two three four five six seven"))
      .toDF("doc_id", "text")
    val fps = graft.dedup.NearDup.winnowedFingerprints(pair)
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("fps").toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "a 6-token shared run must survive winnowing in both docs")
    // the carrier is CORPUS-WIDE off the staged store (round-9 verdict
    // item 3 — no doc_id sliver): one row per fixture doc, density
    // within the winnowing bounds, and the fan-in column live (the
    // 31-word fixture vocabulary guarantees shared runs exist)
    val rows = TrainingData.defs("x126_winnowing")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.size == Tables.documents(spark, sf).count())
    rows.foreach { case (id, m, nSel, density, nNbr) =>
      assert(nSel >= 1 && nSel <= m, s"doc $id n_sel $nSel of $m")
      assert(density > 0.0 && density <= 1.0)
      assert(nNbr >= 0)
    }
    assert(rows.exists(_._5 >= 1), "no doc shares any winnowed fingerprint")
  }

  test("x127 EM interpolation: held-out likelihood is monotone, carrier ≡ driver replica") {
    val scoredDf = TrainingData.emInterpScored(spark, sf)
    val rows = scoredDf.collect().map(r =>
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    scoredDf.unpersist()
    assert(rows.nonEmpty)
    val t = rows.length.toLong
    def q(x: Double): Long =
      BigDecimal.decimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    var l = Seq(0.25, 0.25, 0.25, 0.25)
    var prevNll = Double.MaxValue
    for (it <- 1 to 5) {
      val nll = -rows.map { case (p0, p1, p2, p3) =>
        math.log(l(0) * p0 + l(1) * p1 + l(2) * p2 + l(3) * p3) }.sum / t
      assert(nll <= prevNll + 1e-9, s"EM iteration $it raised held-out NLL")
      prevNll = nll
      val sums = Array.fill(4)(0L)
      rows.foreach { case (p0, p1, p2, p3) =>
        val ps = Array(p0, p1, p2, p3)
        val den = l(0) * p0 + l(1) * p1 + l(2) * p2 + l(3) * p3
        for (o <- 0 to 3) sums(o) += q(l(o) * ps(o) / den * 1e6)
      }
      l = (0 to 3).map(o => sums(o).toDouble / (t.toDouble * 1e6))
    }
    val got = TrainingData.defs("x127_em_interpolation")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set("uniform", "unigram", "bigram", "trigram"))
    val want = Seq("uniform", "unigram", "bigram", "trigram").zip(l).toMap
    want.foreach { case (k, v) =>
      val v6 = BigDecimal.decimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(k) - v6) < 1e-9, s"$k: carrier ${got(k)} replica $v6")
    }
    // a probability mixture: weights stay a near-partition of 1
    // (per-token 1e-6 rounding can drift the sum by at most T·4e-6/T)
    val s = got.values.sum
    assert(s > 0.99 && s < 1.01, s"lambda sum $s")
  }

  test("x137 exact substring dedup: unaligned planted run fully removed, unique text untouched") {
    import spark.implicits._
    // a 6-token run shared at DIFFERENT offsets (3 and 1 — never
    // aligned to x112's 8-token grid): both occurrences must be
    // removed exactly, surrounding unique tokens must survive
    val docs = Seq(
      (1L, "u1 u2 u3 s1 s2 s3 s4 s5 s6 u4 u5 u6"),
      (2L, "v1 s1 s2 s3 s4 s5 s6 v2 v3 v4 v5 v6 v7")).toDF("doc_id", "text")
    val got = TrainingData.exactSubstringDedup(docs, 5).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_dup_tok") == 6)
    assert(got(1L).getAs[Long]("n_spans") == 1)
    assert(got(1L).getAs[Long]("max_span") == 6)
    assert(got(1L).getAs[Long]("clean_n_tok") == 6)
    assert(got(2L).getAs[Long]("n_dup_tok") == 6)
    assert(got(2L).getAs[Long]("clean_n_tok") == 7)
    // both cleans hash the unique remainder, not the shared run
    assert(got(1L).getAs[String]("clean_md5") !=
      got(2L).getAs[String]("clean_md5"))
    // fixture: the 11-token boilerplate tail (+ per-source head) is
    // duplicated across every doc, so every doc loses ≥ 13 tokens in
    // one leading span; and the rebuild must account for every token
    val rows = TrainingData.defs("x137_exact_substring")(spark, sf).collect()
    assert(rows.length >= 100)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_tok") >= 13, s"doc ${r.getLong(0)}")
      assert(r.getAs[Long]("max_span") >= 13)
      assert(r.getAs[Long]("clean_n_tok") ==
        r.getAs[Long]("n_tok") - r.getAs[Long]("n_dup_tok"),
        s"doc ${r.getLong(0)} token accounting")
    }
  }

  test("x135 unigram EM: decode walk reassembles words, J monotone, carrier sane") {
    import spark.implicits._
    // crafted inventory: "abab" must decode [ab, ab] (score −2.0) and
    // NOT the greedy/char fallback; "ba" decodes to its own piece;
    // pieces must reassemble the word exactly and wq must equal the
    // sum of the chosen pieces' scores
    val words = Seq("abab", "ba").toDF("w")
    val scores = Seq(("ab", -10000L), ("a", -100000L), ("b", -100000L),
      ("ba", -15000L)).toDF("p", "sq")
    val dec = TrainingData.unigramDecode(words, scores).collect()
      .map(r => r.getString(0) -> ((r.getSeq[String](1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(dec("abab")._1 == Seq("ab", "ab"), s"got ${dec("abab")._1}")
    assert(dec("abab")._2 == 2L && dec("abab")._3 == -20000L)
    assert(dec("ba")._1 == Seq("ba") && dec("ba")._3 == -15000L)
    // corpus: Viterbi-EM's objective J(θ_t) = Σ f·wq must ascend, up
    // to the M-step's per-piece 1-quantum rounding (≤ 16 quanta per
    // word token — the documented slack)
    val (counts, js) = TrainingData.emUnigramCounts(spark, sf, 3)
    assert(js.size == 3)
    val totalF = Tables.documents(spark, sf)
      .select(explode(graft.text.TextFunctions.wsTokens(
        lower(col("text")))).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= 16).count()
    for (t <- 0 until js.size - 1)
      assert(js(t + 1) >= js(t) - 16 * totalF,
        s"J dropped past quantization slack: ${js(t)} -> ${js(t + 1)}")
    // the first EM step must strictly improve on the substring-
    // frequency heuristic (x117's model): its scores are wildly
    // unnormalized, so the margin is orders beyond the slack
    assert(js(1) > js(0), s"EM step 1 did not improve J: ${js(0)} -> ${js(1)}")
    assert(counts.collect().forall(_.getLong(1) > 0))
    // carrier: vocab = all single chars + at most 16 multi-char pieces
    val rows = TrainingData.defs("x135_unigram_em")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nChars = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), "")).as("c"))
      .filter(col("c").rlike("\\S")).select(col("c")).distinct().count()
    rows.foreach { r =>
      val nv = r.getAs[Long]("n_vocab")
      assert(nv >= nChars && nv <= nChars + 16, s"n_vocab $nv chars $nChars")
      assert(r.getAs[Double]("fertility") >= 1.0)
      assert(r.getAs[Double]("mean_word_nll") > 0.0)
    }
  }

  test("x136 temperature scaling: grid argmin ≡ store, NLL(T*) ≤ NLL(1), ECE does not regress") {
    val grid = TrainingData.clfTempGrid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(grid.map(_._1).toSet == (25L until 401L by 5).toSet)
    val (tqStar, snllStar) = grid.minBy { case (tq, snll) => (snll, tq) }
    val st = spark.read.parquet(TrainingData.ensureClfTemp(spark, sf))
      .collect()
    assert(st.length == 1, "temperature store must hold exactly one row")
    assert(st(0).getLong(0) == tqStar && st(0).getLong(1) == snllStar,
      s"store (${st(0).getLong(0)}, ${st(0).getLong(1)}) != grid argmin ($tqStar, $snllStar)")
    // T = 1 sits on the grid, so the fitted NLL can never exceed the
    // uncalibrated NLL — the acceptance floor of the whole operator
    val snll1 = grid.find(_._1 == 100L).get._2
    assert(snllStar <= snll1, s"fitted NLL $snllStar > uncalibrated $snll1")
    // ECE before/after on the fit split, from the exact quantized scores
    val wdf = spark.read.parquet(TrainingData.ensureClfWeights(spark, sf))
    val valDocs = Tables.documents(spark, sf).filter(
      pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long"), lit(100L)).between(90, 94))
    val vz = TrainingData.clfLogits(
        TrainingData.clfFeatures(valDocs), wdf)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(vz.nonEmpty, "val split empty — fixture too small for the fit")
    def pq(zq: Long, tq: Long): Long =
      math.round(1.0 / (1.0 + math.exp(-((zq.toDouble / 1e9) / (tq.toDouble / 100.0)))) * 1e6)
    def ece(tq: Long): Double = {
      val n = vz.length.toDouble
      vz.groupBy { case (_, zq) => math.min(pq(zq, tq) / 100000, 9L) }
        .values.map { g =>
          val mp = g.map { case (_, zq) => pq(zq, tq) }.sum.toDouble / g.size
          val pr = g.map(_._1).sum.toDouble * 1e6 / g.size
          math.abs(mp - pr) * g.size / n
        }.sum / 1e6
    }
    assert(ece(tqStar) <= ece(100L) + 1e-12,
      s"ECE after ${ece(tqStar)} > before ${ece(100L)}")
    // the carrier emits the fitted T on every row
    val rows = TrainingData.defs("x136_temp_scaling")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("t") - tqStar / 100.0) < 1e-9)
      assert(r.getAs[Double]("gap") >= 0.0)
    }
  }

  test("x138 ROC: AUC ≡ driver midrank recount, curves monotone, endpoints exact") {
    val wdf = spark.read.parquet(TrainingData.ensureClfWeights(spark, sf))
    val (tf, _) = TrainingData.qualityClfTf(spark, sf)
    val scored = TrainingData.clfScores(tf, wdf).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val pos = scored.filter(_._1 == 1L).map(_._2)
    val neg = scored.filter(_._1 == 0L).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty, "need both classes for ROC")
    // exact Mann-Whitney with midrank ties, straight from the pairs
    val u2 = pos.map(p => 2L * neg.count(_ < p) + neg.count(_ == p)).sum
    def q6(num: BigInt, den: BigInt): Double =
      ((2 * num * 1000000 + den) / (2 * den)).toDouble / 1e6
    val aucWant = q6(BigInt(u2), BigInt(2) * pos.length * neg.length)
    val rows = TrainingData.defs("x138_clf_roc")(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.length == 11)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("auc") - aucWant) < 1e-9,
        s"carrier auc ${r.getAs[Double]("auc")} vs recount $aucWant")
    }
    assert(aucWant > 0.5, s"trained scorer must rank better than chance: $aucWant")
    // threshold 0 predicts everything positive
    assert(rows.head.getAs[Double]("tpr") == 1.0)
    assert(rows.head.getAs[Double]("fpr") == 1.0)
    assert(rows.head.getAs[Long]("n_pred_pos") == scored.length)
    // tpr and fpr are non-increasing in the threshold
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("tpr") >= b.getAs[Double]("tpr"))
        assert(a.getAs[Double]("fpr") >= b.getAs[Double]("fpr"))
      case _ => ()
    }
  }

  test("x139 uncertainty sampling: budget respected, cut ≡ driver nearest-rank replay") {
    val wdf = spark.read.parquet(TrainingData.ensureClfWeights(spark, sf))
    val (tf, _) = TrainingData.qualityClfTf(spark, sf)
    val margins = TrainingData.clfScores(tf, wdf).collect()
      .map(r => math.abs(r.getLong(2) - 500000L)).sorted
    val n = margins.length
    // nearest-rank 5th percentile: smallest mg with cum·20 ≥ n
    val cutWant = margins((n + 19) / 20 - 1)
    val rows = TrainingData.defs("x139_uncertainty_sample")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("cut_margin") - cutWant / 1e6) < 1e-9,
        s"cut ${r.getAs[Double]("cut_margin")} vs replay ${cutWant / 1e6}")
      val m = r.getAs[Double]("mean_margin_sel")
      if (r.getAs[Long]("n_sel") > 0)
        assert(m < cutWant / 1e6 + 1e-9, "selected batch must hug the boundary")
    }
    val sel = rows.map(_.getAs[Long]("n_sel")).sum
    assert(sel == margins.count(_ < cutWant), "strict-cut selection count")
    assert(sel <= n / 20, s"budget: $sel of $n exceeds 5%")
  }

  test("x141 waterfilling: budget met exactly, caps respected, unsaturated allocs within 1") {
    val rows = TrainingData.defs("x141_unimax_alloc")(spark, sf).collect()
    assert(rows.nonEmpty)
    val totTok = rows.map(_.getAs[Long]("n_tok")).sum
    val b = totTok / 2
    assert(rows.map(_.getAs[Long]("alloc")).sum == b,
      "waterfilling must spend the budget exactly")
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc") <= r.getAs[Long]("cap"))
      assert(r.getAs[Long]("alloc") >= 0)
      if (r.getAs[Boolean]("saturated"))
        assert(r.getAs[Long]("alloc") == r.getAs[Long]("cap"))
    }
    val unsat = rows.filter(!_.getAs[Boolean]("saturated"))
      .map(_.getAs[Long]("alloc"))
    if (unsat.nonEmpty)
      assert(unsat.max - unsat.min <= 1,
        s"uniform split violated: ${unsat.min}..${unsat.max}")
    // every saturated cap sits below every unsaturated allocation
    // (the waterline property)
    val satCaps = rows.filter(_.getAs[Boolean]("saturated"))
      .map(_.getAs[Long]("cap"))
    if (satCaps.nonEmpty && unsat.nonEmpty)
      assert(satCaps.max <= unsat.min + 1)
  }

  test("x142 label noise: thresholds ≡ driver replay, flags are the confident off-diagonal") {
    val wdf = spark.read.parquet(TrainingData.ensureClfWeights(spark, sf))
    val (tf, _) = TrainingData.qualityClfTf(spark, sf)
    val scored = TrainingData.clfScores(tf, wdf).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    def meanQ(vs: Seq[Long]): Long =
      ((2 * BigInt(vs.sum) + vs.length) / (2 * BigInt(vs.length))).toLong
    val t1 = meanQ(scored.filter(_._1 == 1L).map(_._2).toSeq)
    val t0 = meanQ(scored.filter(_._1 == 0L).map(_._2).map(1000000L - _).toSeq)
    val want0to1 = scored.count { case (y, pq) => y == 0L && pq >= t1 }
    val want1to0 = scored.count { case (y, pq) => y == 1L && 1000000L - pq >= t0 }
    val rows = TrainingData.defs("x142_label_noise")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("t1") - t1 / 1e6) < 1e-9)
      assert(math.abs(r.getAs[Double]("t0") - t0 / 1e6) < 1e-9)
    }
    assert(rows.map(_.getAs[Long]("n_sus_0to1")).sum == want0to1)
    assert(rows.map(_.getAs[Long]("n_sus_1to0")).sum == want1to0)
    // confident thresholds sit above chance — the flags are genuinely
    // confident contradictions, not half-sure ones
    assert(t1 > 500000L && t0 > 500000L)
  }

  test("x165 truncation loss: census replica; loss monotone down in L; identities hold") {
    import graft.text.TextFunctions._
    val lens = Tables.documents(spark, sf)
      .select(col("source"), tokenCount(col("text")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = TrainingData.defs("x165_truncation_loss")(spark, sf)
      .collect()
    assert(rows.length == lens.size * 3)
    rows.foreach { r =>
      val ls = lens(r.getAs[String]("source"))
      val sl = r.getAs[Long]("seq_len")
      assert(r.getAs[Long]("n_docs") == ls.length.toLong)
      assert(r.getAs[Long]("n_truncated") == ls.count(_ > sl).toLong)
      assert(r.getAs[Long]("tok_lost") ==
        ls.map(n => math.max(n - sl, 0L)).sum)
    }
    // longer sequence lengths can only lose less
    rows.groupBy(r => r.getAs[String]("source")).values.foreach { rs =>
      val byL = rs.sortBy(_.getAs[Long]("seq_len"))
        .map(_.getAs[Long]("tok_lost"))
      assert(byL.sliding(2).forall(p => p(1) <= p(0)))
    }
  }

  test("x164 Wilson: bound only shrinks; small samples are demoted; replica agrees") {
    import graft.ml.LogFit
    def wilson(k: Long, n: Long): Double = {
      val nD = n.toDouble; val ph = k.toDouble / nD
      val lb = (ph + 3.8416 / (2.0 * nD)
        - 1.96 * math.sqrt((ph * (1.0 - ph) + 3.8416 / (4.0 * nD)) / nD)) /
        (1.0 + 3.8416 / nD)
      LogFit.qScaled(lb, 1e4).toDouble / 1e4
    }
    val rows = TrainingData.defs("x164_wilson_bound")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val k = r.getAs[Long]("n_kept")
      assert(r.getAs[Double]("wilson_lb") == wilson(k, n),
        r.getAs[String]("source"))
      assert(r.getAs[Double]("wilson_lb") <=
        r.getAs[Double]("keep_rate") + 1e-9,
        "the correction must only ever shrink")
      assert(r.getAs[Double]("wilson_lb") >= -1e-9)
    }
    // the small-sample demotion the bound exists for: a perfect 3/3
    // ranks BELOW a 96% 1000-sample under the lower bound, even
    // though the naive shares say the opposite
    assert(wilson(3, 3) < wilson(960, 1000))
    assert(3.0 / 3.0 > 960.0 / 1000.0)
  }

  test("x163 kappa: chance correction bites on skewed sources; replica agrees") {
    val wdf = spark.read.parquet(TrainingData.ensureClfWeights(spark, sf))
    val (tf, _) = TrainingData.qualityClfTf(spark, sf)
    val scored = TrainingData.clfScores(tf, wdf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .select(col("source"), col("y"), col("pq")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.getLong(2) >= 500000L) 1L else 0L))
    val rows = TrainingData.defs("x163_cohen_kappa")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val s = scored.filter(_._1 == src)
      val n = s.length.toLong
      val agree = s.count(t => t._2 == t._3).toLong
      val p1 = s.map(_._2).sum; val p2 = s.map(_._3).sum
      val chance = p1 * p2 + (n - p1) * (n - p2)
      assert(r.getAs[Long]("n_docs") == n)
      def q4(num: Long, den: Long): Double = {
        val sign = if (num < 0) -1L else 1L
        sign * ((2 * math.abs(num) + den) / (2 * den)) / 1e4
      }
      assert(r.getAs[Double]("po") == q4(agree * 10000, n))
      assert(r.getAs[Double]("pe") == q4(chance * 10000, n * n))
      if (n * n != chance)
        assert(r.getAs[Double]("kappa") ==
          q4((n * agree - chance) * 10000, n * n - chance), src)
      // kappa ≤ po: chance correction never inflates agreement when
      // agreement beats chance, and it is the whole point of the stat
      if (!r.isNullAt(r.fieldIndex("kappa")) &&
          r.getAs[Double]("po") > r.getAs[Double]("pe"))
        assert(r.getAs[Double]("kappa") <= r.getAs[Double]("po") + 1e-9)
    }
  }

  test("x162 Neyman: budget landed exactly; allocation tracks N_h·sigma_h; replica agrees") {
    import graft.text.TextFunctions._
    val rows = TrainingData.defs("x162_neyman_alloc")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("alloc")).sum == 1000L,
      "largest-remainder rounding must land the budget exactly")
    // independent replica of the whole design
    val q4s = Tables.documents(spark, sf)
      .select(col("source"),
        round(qualityScore(col("text"), Seq("the", "a", "of", "and"))
          * 1e4, 0).cast("long").as("q4"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val aByS = q4s.map { case (src, qs) =>
      val n = qs.length.toLong
      val sq = qs.sum; val sqq = qs.map(v => v * v).sum
      val sd4 = graft.ml.LogFit.qScaled(
        math.sqrt((n * sqq - sq * sq).toDouble) / n.toDouble, 1.0)
      src -> n * sd4
    }
    val sTot = aByS.values.sum
    val base = aByS.view.mapValues(a => 1000L * a / sTot).toMap
    val k = 1000L - base.values.sum
    val extras = aByS.toSeq
      .sortBy { case (src, a) => (-(1000L * a % sTot), src) }
      .take(k.toInt).map(_._1).toSet
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("alloc") ==
        base(src) + (if (extras(src)) 1L else 0L), src)
    }
    // the Neyman property: allocation order follows N_h·σ_h order
    val byA = rows.sortBy(r => -aByS(r.getAs[String]("source")))
      .map(_.getAs[Long]("alloc"))
    assert(byA.sliding(2).forall(p => p(0) >= p(1) - 1),
      "allocation must track the N·sigma ranking (within rounding)")
  }

  test("x161 A-ES reservoir: driver replica reproduces the top-50; weights lift keys") {
    import graft.ml.LogFit
    def h32(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 until 4).map(i => (h(i) & 0xffL) << (8 * (3 - i))).sum
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map { r =>
        val id = r.getLong(0)
        val w = r.getString(1).trim.split("\\s+").length.toLong
        val u = (h32(id.toString).toDouble + 1.0) / 4294967296.0
        (id, w, LogFit.qScaled(math.log(u) / w.toDouble, 1e6))
      }
    val want = docs.sortBy { case (id, _, k) => (-k, id) }.take(50)
    val got = TrainingData.defs("x161_weighted_reservoir")(spark, sf)
      .collect()
    assert(got.length == math.min(50, docs.length))
    got.zip(want).foreach { case (g, (id, w, k)) =>
      assert(g.getAs[Long]("doc_id") == id)
      assert(g.getAs[Long]("n_tok") == w)
      assert(g.getAs[Double]("aes_key") == k.toDouble / 1e6)
    }
    // the A-ES property that makes it WEIGHTED: for a fixed u, a
    // larger weight yields a larger (less negative) key
    val u = 0.25
    assert(math.log(u) / 100.0 > math.log(u) / 10.0)
  }

  test("x160 KMV: driver replica reproduces every estimate; small sources fall back to exact") {
    def h32(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 until 4).map(i => (h(i) & 0xffL) << (8 * (3 - i))).sum
    }
    val pairs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .flatMap { r =>
        r.getString(1).trim.split("\\s+")
          .map(w => (r.getString(0), w))
      }.distinct
    val bySource = pairs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = TrainingData.defs("x160_kmv_distinct")(spark, sf).collect()
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val words = bySource(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_exact") == words.length.toLong)
      val hs = words.map(h32).sorted
      val want =
        if (hs.length < 64) words.length.toLong
        else {
          val hk = math.max(hs(63), 1L)
          (2 * 63L * 4294967296L + hk) / (2 * hk)
        }
      assert(r.getAs[Long]("est") == want,
        s"${r.getAs[String]("source")}: est vs replica")
      if (words.length < 64)
        assert(r.getAs[Double]("rel_error") == 0.0,
          "sub-k sources must report exactly")
    }
  }

  test("x159 TracIn: full driver replica reproduces the top-20 self-influence queue") {
    import graft.ml.LogFit
    val trajW = spark.read.parquet(TrainingData.ensureClfTrajectory(spark, sf))
      .collect().groupBy(_.getLong(0)).view.mapValues { rs =>
        val w = Array.fill(68)(0.0)
        rs.foreach(r => w(r.getLong(1).toInt) = r.getDouble(2))
        w
      }.toMap
    val (tf, _) = TrainingData.qualityClfTf(spark, sf)
    val rows = tf.select("doc_id", "y", "xs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2)))
    val si = rows.map { case (doc, y, xs) =>
      val a = (1L to 20L).map { step =>
        val w = trajW(step)
        val zq = xs.zipWithIndex
          .map { case (x, b) => LogFit.qScaled(w(b) * x, 1e9) }.sum
        val pq = LogFit.qScaled(
          1.0 / (1.0 + math.exp(-(zq.toDouble / 1e9))), 1e6)
        val dq = pq - y * 1000000L
        dq * dq
      }.sum
      val a6 = (2 * a + 1000000L) / 2000000L
      val b6 = xs.map(x => LogFit.qScaled(x * x, 1e6)).sum
      (doc, y, (2 * (16L * a6 * b6) + 1000000L) / 2000000L)
    }.toSeq
    val want = si.sortBy { case (doc, _, s) => (-s, doc) }.take(20)
    val got = TrainingData.defs("x159_tracin_self")(spark, sf).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, (doc, y, s)) =>
      assert(g.getAs[Long]("doc_id") == doc, s"rank ${g.getAs[Long]("rk")}")
      assert(g.getAs[Long]("y") == y)
      assert(g.getAs[Double]("self_influence") == s.toDouble / 1e6)
    }
  }

  test("x158 forgetting: never-learned/unforgettable/forgotten partition each label exactly") {
    val rows = TrainingData.defs("x158_forgetting_events")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val (tf, _) = TrainingData.qualityClfTf(spark, sf)
    val nDocs = tf.select("doc_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      // the three states are mutually exclusive and exhaustive: a
      // forget requires a prior correct step, so forgotten ∧
      // never-learned is impossible
      assert(r.getAs[Long]("n_never_learned")
        + r.getAs[Long]("n_unforgettable")
        + r.getAs[Long]("n_forgotten") == r.getAs[Long]("n_docs"))
      // at most one forget per correct→incorrect boundary in 20 steps
      assert(r.getAs[Long]("max_forgets") <= 10L)
      assert(r.getAs[Double]("mean_forgets") >= 0.0)
    }
  }

  test("x157 cartography: trajectory snapshots replay; regions partition the corpus") {
    // the persisted trajectory is exactly the trainer's snapshots —
    // step 20 must equal the serving registry bit-for-bit
    val traj = spark.read.parquet(TrainingData.ensureClfTrajectory(spark, sf))
    val steps = traj.select("step").distinct().collect()
      .map(_.getLong(0)).sorted
    assert(steps.toSeq == (1L to 20L))
    val w20 = traj.filter(col("step") === 20L)
      .select("bucket", "wb").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val reg = spark.read.parquet(TrainingData.ensureClfWeights(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w20 == reg, "final snapshot must equal the serving registry")
    val rows = TrainingData.defs("x157_cartography")(spark, sf).collect()
    assert(rows.nonEmpty)
    val (tf, _) = TrainingData.qualityClfTf(spark, sf)
    val nDocs = tf.select("doc_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "regions must partition every doc exactly once")
    rows.foreach { r =>
      val c = r.getAs[Double]("mean_conf"); val v = r.getAs[Double]("mean_vari")
      assert(c >= 0.0 && c <= 1.0); assert(v >= 0.0 && v <= 0.5 + 1e-9)
      r.getAs[String]("region") match {
        case "easy_to_learn" => assert(c >= 0.7)
        case "hard_to_learn" => assert(c <= 0.3)
        case _ => ()
      }
    }
    // signature property of the map: when both poles exist, the easy
    // region's confidence dominates the hard region's
    val byRegion = rows.groupBy(_.getAs[String]("region"))
    for (e <- byRegion.get("easy_to_learn"); h <- byRegion.get("hard_to_learn"))
      assert(e.map(_.getAs[Double]("mean_conf")).min >
        h.map(_.getAs[Double]("mean_conf")).max)
  }

  test("x156 repeat value: D_eff monotone to the U·(1+R*) asymptote, efficiency decays from 1") {
    val rows = TrainingData.defs("x156_repeat_value")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val byE = rs.sortBy(_.getAs[Long]("epochs"))
      val u = byE.head.getAs[Long]("u_tok")
      // R = 0 is exactly fresh data: D_eff = U, efficiency 1
      assert(byE.head.getAs[Long]("epochs") == 0L)
      assert(byE.head.getAs[Long]("d_eff") == u)
      assert(byE.head.getAs[Double]("efficiency") == 1.0)
      // monotone increasing effective data, decaying efficiency,
      // bounded by the published asymptote U·(1+R*)
      assert(byE.sliding(2).forall(p =>
        p(1).getAs[Long]("d_eff") >= p(0).getAs[Long]("d_eff")))
      assert(byE.sliding(2).forall(p =>
        p(1).getAs[Double]("efficiency") <= p(0).getAs[Double]("efficiency")
          + 1e-9))
      assert(byE.last.getAs[Long]("d_eff") <=
        math.ceil(u.toDouble * 16.39).toLong)
      // the paper's headline: 4 epochs still buy ≥ 85% of fresh value
      val e4 = byE.find(_.getAs[Long]("epochs") == 4L).get
      assert(e4.getAs[Double]("efficiency") > 0.85)
      // ... while 32 epochs are deeply discounted
      val e32 = byE.find(_.getAs[Long]("epochs") == 32L).get
      assert(e32.getAs[Double]("efficiency") < 0.55)
    }
  }

  test("x155 SGT: seen mass renormalizes to 1−P0; switch is a clean prefix; estimates positive") {
    import graft.text.TextFunctions._
    val rows = TrainingData.defs("x155_sgt_smoothing")(spark, sf)
      .collect().sortBy(_.getAs[Long]("r"))
    assert(rows.nonEmpty)
    val counts = Tables.documents(spark, sf)
      .select(explode(wsTokens(col("text"))).as("w"))
      .collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum
    val n1 = counts.values.count(_ == 1L).toLong
    // the renormalization identity x151's RAW estimator provably
    // fails on gappy tails: Σ N_r·p_sgt(r) = 1 − P0, to quantization
    val seenMass = rows.map(r =>
      r.getAs[Long]("n_r").toDouble * r.getAs[Double]("p_sgt")).sum
    assert(math.abs(seenMass - (1.0 - n1.toDouble / total)) <=
      total.toDouble * 1e-8 + 1e-9,
      s"seen mass $seenMass vs ${1.0 - n1.toDouble / total}")
    // once switched to LGT, stay switched (the published rule)
    val used = rows.map(_.getAs[Boolean]("lgt_used"))
    assert(used.sliding(2).forall(p => !p(0) || p(1)),
      "lgt_used must be a suffix of the rank order")
    rows.foreach { r =>
      assert(r.getAs[Double]("r_sgt") > 0)
      assert(r.getAs[Double]("p_sgt") > 0)
      // the switched estimator IS the advertised branch
      if (r.getAs[Boolean]("lgt_used"))
        assert(r.getAs[Double]("r_sgt") == r.getAs[Double]("r_lgt"))
      else
        assert(r.getAs[Double]("r_sgt") == r.getAs[Double]("r_turing"))
    }
  }

  test("x153/x154 power-law fits: exact crafted law recovered; carriers replay driver-side") {
    import graft.ml.LogFit
    // exactly collinear quantized points (y = 3·x^0.5 in log space):
    // the integer OLS must recover slope and intercept exactly, R² = 1
    val ln3q = math.round(math.log(3.0) * 1e6)
    val pts = (1 to 8).map(k => (k * 1000000L, ln3q + k * 500000L))
    val f = LogFit.fit(pts)
    assert(f.slopeQ == 500000L)
    assert(f.interceptQ == ln3q)
    assert(LogFit.r2Q(pts, f).contains(1000000L))
    // Heaps carrier ≡ independent replay off x67's curve
    val curve = TrainingData.defs("x67_vocab_growth")(spark, sf)
      .select(col("cum_tok"), col("cum_types")).collect()
    val hw = LogFit.fit(curve.map(r => (LogFit.lq(r.getLong(0).toDouble),
      LogFit.lq(r.getLong(1).toDouble))).toSeq)
    val heaps = TrainingData.defs("x153_heaps_fit")(spark, sf).collect()
    assert(heaps.length == 1)
    assert(heaps(0).getAs[Double]("beta") == hw.slopeQ.toDouble / 1e6)
    assert(heaps(0).getAs[Double]("ln_k") == hw.interceptQ.toDouble / 1e6)
    val beta = heaps(0).getAs[Double]("beta")
    // the 31-word sf0.001 fixture exhausts its vocabulary in the
    // first decile — beta = 0 IS the flat-corpus signal the operator
    // exists to report; natural corpora sit in (0, 1)
    assert(beta >= 0 && beta < 1, s"Heaps exponent $beta out of [0,1)")
    // extrapolation dominates the observed vocabulary (monotone growth)
    assert(heaps(0).getAs[Double]("v_pred_10x") >=
      curve.map(_.getLong(1)).max.toDouble * 0.5)
    // Zipf carrier: decreasing head, meaningful linear fit
    val zipf = TrainingData.defs("x154_zipf_fit")(spark, sf).collect()
    assert(zipf.length == 1)
    assert(zipf(0).getAs[Long]("n_points") == 30L ||
      zipf(0).getAs[Long]("n_points") > 0)
    assert(zipf(0).getAs[Double]("slope") < 0,
      "rank-frequency head must decrease")
    val r2 = zipf(0).getAs[Double]("r2")
    assert(r2 > 0 && r2 <= 1.0 + 1e-9)
  }

  test("x152 quality survivor: keeper is the exact per-cluster quality argmax") {
    val rows = TrainingData.defs("x152_quality_survivor")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // independent replay: cluster membership + per-doc quality argmax
    val corpus = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val withDupes = corpus
      .unionByName(corpus.select((col("doc_id") + 1000000L).as("doc_id"),
        col("text")))
      .unionByName(corpus.select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text")))
      .filter(col("doc_id") % 1000000 < 200)
    val q = withDupes.select(col("doc_id"),
        round(graft.text.TextFunctions.qualityScore(col("text"),
          Seq("the", "a", "of", "and")) * 1e4, 0).cast("long").as("q4"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val labels = graft.dedup.NearDup.clusters(withDupes,
        TrainingData.defs("x4_ngram_jaccard")(spark, sf))
      .select(col("doc_id"), col("canonico")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = labels.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    rows.foreach { r =>
      val members = byCluster(r.getAs[Long]("canonico"))
      assert(members.size.toLong == r.getAs[Long]("n_membros"))
      val want = members.maxBy(id => (q(id), -id))
      assert(r.getAs[Long]("keeper") == want,
        s"cluster ${r.getAs[Long]("canonico")}: keeper vs argmax")
      assert(r.getAs[Boolean]("policy_differs") ==
        (want != r.getAs[Long]("canonico")))
    }
    // the synthesized near-copies append a token, which lifts the
    // length band below 50 tokens — the quality policy must actually
    // DIVERGE from min-id somewhere on this corpus
    assert(rows.exists(_.getAs[Boolean]("policy_differs")),
      "quality policy should differ from min-id on the dup corpus")
  }

  test("x151 Good-Turing: FoF census exact; head telescope and Turing replay hold") {
    import graft.text.TextFunctions._
    // independent FoF census
    val counts = Tables.documents(spark, sf)
      .select(explode(wsTokens(col("text"))).as("w"))
      .collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fof = counts.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val total = counts.values.sum
    val rows = TrainingData.defs("x151_good_turing")(spark, sf).collect()
    assert(rows.length == fof.size + 1)
    val byR = rows.map(r => r.getAs[Long]("r") -> r).toMap
    fof.foreach { case (r, nr) =>
      assert(byR(r).getAs[Long]("n_r") == nr, s"N_$r")
    }
    // unseen mass row: r = 0 carries P0 = N1/N
    val p0 = byR(0L).getAs[Double]("gt_mass")
    assert(math.abs(p0 - fof.getOrElse(1L, 0L).toDouble / total) <= 1e-6)
    // (the sf0.001 fixture has no singleton tokens — P0 = 0 there is
    // correct, not a bug; sf0.01+ corpora carry a live unseen mass)
    // exact census identity: sum of r·N_r over the FoF table is N
    assert(fof.map { case (r, nr) => r * nr }.sum == total)
    // partial telescope over the gapless head [0, R): the quantized
    // class masses sum to the head token share (Σ_{r'≤R} r'·N_{r'})/N
    val gap = (1L to fof.keys.max).find(r => !fof.contains(r))
      .getOrElse(fof.keys.max + 1)
    val headRows = rows.filter(_.getAs[Long]("r") < gap)
    val headSum = headRows.map(_.getAs[Double]("gt_mass")).sum
    val headWant = fof.filter(_._1 <= gap).map { case (r, nr) => r * nr }
      .sum.toDouble / total
    assert(math.abs(headSum - headWant) <= headRows.length * 1e-6,
      s"head telescope: $headSum vs $headWant (gap at $gap)")
    // r* is the Turing estimate where defined
    rows.filter(r => !r.isNullAt(r.fieldIndex("r_star"))).foreach { r =>
      val rr = r.getAs[Long]("r")
      val want = (BigInt(2) * (rr + 1) * fof(rr + 1) * 10000 + fof(rr)) /
        (BigInt(2) * fof(rr))
      assert(r.getAs[Double]("r_star") == want.toLong.toDouble / 1e4)
    }
  }

  test("x150 EL2N: cut replayed driver-side; pruned mass is the easy-confident fifth") {
    val wdf = spark.read.parquet(TrainingData.ensureClfWeights(spark, sf))
    val (tf, _) = TrainingData.qualityClfTf(spark, sf)
    val el2n = TrainingData.clfScores(tf, wdf).collect()
      .map(r => math.abs(r.getLong(2) - r.getLong(1) * 1000000L)).sorted
    val n = el2n.length
    val cut = el2n.find(v => el2n.count(_ <= v) * 5 >= n).get
    val wantPruned = el2n.count(_ < cut)
    assert(wantPruned * 5 < n, "strictly-below-cut pruning stays under 20%")
    val rows = TrainingData.defs("x150_el2n_prune")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n.toLong)
    assert(rows.map(_.getAs[Long]("n_pruned")).sum == wantPruned.toLong)
    // pruned examples are confidently-correct: every pruned EL2N sits
    // below every kept one by construction of the global cut
    rows.foreach { r =>
      val shareB = r.getAs[Double]("pos_share_before")
      assert(shareB >= 0.0 && shareB <= 1.0)
      if (r.getAs[Long]("n_docs") > r.getAs[Long]("n_pruned"))
        assert(r.getAs[Double]("pos_share_after") >= 0.0)
    }
  }

  test("x149 RHO-loss: learnable structure outranks gibberish; cut replayed driver-side") {
    import spark.implicits._
    // reference (train) split: a well-attested pattern + vocab filler;
    // pool: docA repeats the attested pattern with rare-for-the-pool
    // tokens (high current loss, LOW reference loss — learnable),
    // docB is gibberish unseen everywhere (high loss under BOTH)
    val train = ((1 to 10).map(i => (100L + i, "xx yy xx yy")) :+
      (200L, (1 to 20).map(i => s"f$i").mkString(" "))).toDF("doc_id", "text")
    val pool = Seq((1L, "xx yy xx yy xx yy"), (2L, "pp qq rr ss"))
      .toDF("doc_id", "text")
    val red = TrainingData.rholossRedQ(pool, train).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(red(1L) > red(2L),
      s"structured doc must out-score gibberish: $red")
    // carrier: replay the global top-decile cut on the pool scores
    val docs = Tables.documents(spark, sf)
    val balde = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long"), lit(100L))
    val scores = TrainingData.rholossRedQ(docs.filter(balde >= 90),
        docs.filter(balde < 90))
      .collect().map(_.getLong(1)).sorted
    val n = scores.length
    val cut = scores.zipWithIndex
      .collectFirst { case (v, i) if scores.count(_ <= v) * 10 >= n * 9 => v }
      .get
    val wantSel = scores.count(_ > cut)
    val rows = TrainingData.defs("x149_rholoss_select")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n.toLong)
    assert(rows.map(_.getAs[Long]("n_sel")).sum == wantSel.toLong)
    assert(wantSel <= n / 10, "strict top-decile selection")
    // selected values all sit above the global cut, so every source's
    // selected mean dominates its overall mean
    rows.filter(_.getAs[Long]("n_sel") > 0).foreach { r =>
      assert(r.getAs[Double]("mean_red_sel") >=
        r.getAs[Double]("mean_red") - 2e-4)
    }
  }

  test("x166 DoReMi: high-excess domain gains weight; every iterate lands on the simplex exactly") {
    import spark.implicits._
    // crafted skew: "grammar" docs cycle a deterministic 4-token
    // pattern — the bigram reference nails it while the unigram proxy
    // pays ln(8) per token (HIGH excess); "flat" docs shuffle two
    // tokens with no sequential structure — bigram ≈ coin flip, so
    // the excess is the much smaller ln(8)−ln(2) gap
    val docs = ((0 until 200).map(i =>
        (i.toLong, "grammar", "a b c d a b c d a b c d")) ++
      (0 until 200).map(i =>
        (1000L + i, "flat", "p q q p p q q p q p q p")))
      .toDF("doc_id", "source", "text")
    val ex = TrainingData.doremiExcessQ(docs).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(3))).toSeq
    val exm = ex.toMap
    assert(exm("grammar") > exm("flat") && exm("flat") >= 0L,
      s"bigram-structured domain must carry the larger excess: $exm")
    val (steps, fin) = TrainingData.doremiWeights(ex)
    steps.foreach(st => assert(st.map(_._2).sum == 1000000L,
      s"step iterate must sum to 1e6 exactly: $st"))
    assert(fin.map(_._2).sum == 1000000L,
      s"final average must sum to 1e6 exactly: $fin")
    val fm = fin.toMap
    assert(fm("grammar") > 500000L && fm("flat") < 500000L,
      s"excess-loss domain must end above uniform: $fm")
    // fixed positive multipliers: the high-excess share never shrinks
    val traj = steps.map(_.toMap.apply("grammar"))
    assert(traj.zip(traj.tail).forall { case (a, b) => b >= a },
      s"grammar weight must be non-decreasing: $traj")
  }

  test("x167 tokenizer audit: cross-tokenizer orderings on the fixture; closed unigram inventory flags unseen-char OOV") {
    import spark.implicits._
    val rows = TrainingData.defs("x167_tokenizer_audit")(spark, sf).collect()
    assert(rows.length == 3)
    val m = rows.map(r => r.getString(0) -> r).toMap
    assert(Set("bpe", "unigram", "wordpiece") == m.keySet)
    // identical denominators across the three rows
    assert(rows.map(_.getAs[Long]("n_words")).distinct.length == 1)
    // the rich 1-4-char piece inventory beats 50 merges over the
    // top-1024 vocab on fertility (the x117 Viterbi-optimality edge,
    // re-asserted cross-tokenizer per the round-10 verdict)
    assert(m("unigram").getAs[Double]("fertility") <=
      m("bpe").getAs[Double]("fertility"))
    assert(m("unigram").getAs[Double]("fertility") <=
      m("wordpiece").getAs[Double]("fertility"))
    // char-open tokenizers can always emit
    assert(m("bpe").getAs[Long]("n_oov") == 0L)
    assert(m("wordpiece").getAs[Long]("n_oov") == 0L)
    rows.foreach { r =>
      assert(r.getAs[Double]("fertility") >= 1.0 - 1e-9)
      assert(r.getAs[Double]("compression") >= 1.0 - 1e-9)
    }
    // crafted OOV: a held-out-only word carrying a char the train
    // split never saw is unrepresentable for the closed unigram
    // inventory but still segments under the char-open merge pair
    val hoId = spark.range(1000, 2000)
      .withColumn("b", pmod(conv(substring(md5(col("id")
        .cast("string")), 1, 4), 16, 10).cast("long"), lit(100L)))
      .filter(col("b") >= 90).head().getLong(0)
    val docs = ((0L until 300L).map(i =>
        (i, "src", "alpha beta gamma delta epsilon")) :+
      ((hoId, "src", "weirdo" + "ø")))
      .toDF("doc_id", "source", "text")
    val out = TrainingData.tokenizerAuditOn(spark, docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("unigram").getAs[Long]("n_oov") > 0L,
      s"unseen char must be unigram-OOV: ${out.values.toSeq}")
    assert(out("bpe").getAs[Long]("n_oov") == 0L)
    assert(out("wordpiece").getAs[Long]("n_oov") == 0L)
  }

  test("x168 curriculum: budget lands exactly, stage composition honors the cartography regions, never-learned are dropped") {
    val rows = TrainingData.defs("x168_curriculum_schedule")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val kept = rows.filter(_.getAs[Long]("stage") >= 1L)
    val keptTok = kept.map(_.getAs[Long]("n_tok")).sum
    // Σ alloc = half the kept token mass EXACTLY (largest remainder)
    assert(rows.map(_.getAs[Long]("alloc")).sum == keptTok / 2L,
      s"allocs must land on the budget: ${rows.toSeq}")
    // dropped rows carry no budget
    rows.filter(_.getAs[Long]("stage") == 0L)
      .foreach(r => assert(r.getAs[Long]("alloc") == 0L))
    // stage composition = the cartography curriculum
    val want = Map(1L -> Set("easy_to_learn"),
      2L -> Set("middle", "ambiguous"), 3L -> Set("hard_to_learn"))
    kept.foreach { r =>
      assert(want(r.getAs[Long]("stage"))(r.getAs[String]("region")),
        s"stage/region mismatch: $r")
    }
    // the dropped mass reconciles with x158's never-learned count
    val neverLearned = TrainingData.defs("x158_forgetting_events")(spark, sf)
      .collect().map(_.getAs[Long]("n_never_learned")).sum
    val dropped = rows.filter(_.getAs[Long]("stage") == 0L)
      .map(_.getAs[Long]("n_docs")).sum
    assert(dropped == neverLearned,
      s"stage-0 docs ($dropped) must equal x158 never-learned ($neverLearned)")
  }

  test("x170 scaling fit: exactly-collinear decay recovers slope/R*/half-life exactly; flat novelty yields NULL decay") {
    import spark.implicits._
    // decay source: deciles 0/1/2 introduce exactly 1000/100/10 new
    // trigrams (docs of 1002/102/12 unique tokens, max id 2 → width 1)
    // — lq(10^k) quantizes to exactly k·2302585, so the log points are
    // EXACTLY collinear and the integer OLS recovers them exactly
    def toks(src: String, id: Long, n: Int): String =
      (0 until n).map(i => s"${src}_${id}_t$i").mkString(" ")
    val docs = Seq(
      (0L, "decay", toks("d", 0, 1002)),
      (1L, "decay", toks("d", 1, 102)),
      (2L, "decay", toks("d", 2, 12)),
      (0L, "flat", toks("f", 0, 12)),
      (1L, "flat", toks("f", 1, 12)),
      (2L, "flat", toks("f", 2, 12)))
      .toDF("doc_id", "source", "text")
    val out = TrainingData.scalingFitOn(spark, docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val dRow = out("decay")
    assert(dRow.getAs[Long]("n_points") == 3L)
    assert(dRow.getAs[Double]("slope") == -2.302585,
      s"collinear decade decay must recover ln10 exactly: $dRow")
    assert(dRow.getAs[Double]("r_star") == 0.4343, s"R* replay: $dRow")
    assert(dRow.getAs[Double]("half_life") == 0.301, s"half-life: $dRow")
    assert(dRow.getAs[Double]("r2") == 1.0,
      s"zero residual on collinear points: $dRow")
    val fRow = out("flat")
    assert(fRow.getAs[Double]("slope") == 0.0)
    assert(fRow.isNullAt(fRow.fieldIndex("r_star"))
      && fRow.isNullAt(fRow.fieldIndex("half_life")),
      s"non-negative slope must report no decay scale: $fRow")
    // carrier on the fixture: every emitted R* is positive and the
    // half-life sits below it (ln 2 < 1)
    val rows = TrainingData.defs("x170_scaling_fit")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getAs[Double]("r_star") > 0.0)
      assert(r.getAs[Double]("half_life") < r.getAs[Double]("r_star"))
    }
  }

  test("x171 Min-K%: memorized text scores likelier at its worst positions; carrier separates planted from clean") {
    import spark.implicits._
    // crafted memorization: train docs share a rigid template, so a
    // re-presented member's WORST bigrams are still well-attested;
    // the clean doc chains tokens never seen adjacent in training
    val train = (0 until 400).map(i =>
      (i.toLong, s"begin alpha beta gamma delta end"))
    val docs = train.toDF("doc_id", "text")
    val out = TrainingData.minkMembershipOn(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // every pool doc here is either a re-keyed member (planted) or a
    // held-out copy of the same template (clean) — identical text, so
    // Min-K% must agree EXACTLY: the statistic depends only on text
    assert(out("planted").getAs[Double]("mean_mink_nll") ==
      out("clean").getAs[Double]("mean_mink_nll"),
      s"identical text must score identically: $out")
    // now make the clean side genuinely novel
    val docs2 = (train ++ (10000 until 10400).map(i =>
        (i.toLong, s"zz${i} qq${i} rr${i} ss${i} tt${i} uu${i}")))
      .toDF("doc_id", "text")
    val out2 = TrainingData.minkMembershipOn(docs2).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out2("planted").getAs[Double]("mean_mink_nll") <
      out2("clean").getAs[Double]("mean_mink_nll"),
      s"members must score likelier than novel text: $out2")
    // fixture carrier: same ordering on the real corpus
    val rows = TrainingData.defs("x171_mink_membership")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("planted").getAs[Double]("mean_mink_nll") <
      rows("clean").getAs[Double]("mean_mink_nll"),
      s"fixture separation: $rows")
  }

  test("x172 LOO value: a sole-holder source prices positive, dead weight prices negative") {
    import spark.implicits._
    // crit is the only holder of the token its held-out slice needs;
    // junk shares its useful tokens with base but carries per-doc-
    // unique gibberish whose mass only dilutes everyone else's probs
    val docs = (
      (0 until 300).map(i =>
        (i.toLong, "crit", "needle needle needle needle")) ++
      (1000 until 1300).map(i =>
        (i.toLong, "base", "alpha beta gamma alpha beta")) ++
      (2000 until 2300).map(i =>
        (i.toLong, "junk", s"alpha beta jk${i}a jk${i}b jk${i}c jk${i}d")))
      .toDF("doc_id", "source", "text")
    val out = TrainingData.looSourceValueOn(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("crit").getAs[Double]("delta") > 0.0,
      s"sole holder must price positive: ${out.values.toSeq}")
    assert(out("junk").getAs[Double]("delta") < 0.0,
      s"dead weight must price negative: ${out.values.toSeq}")
    assert(out("crit").getAs[Double]("delta") >
      out("base").getAs[Double]("delta"))
    // u_types: junk's per-doc gibberish is unique to it
    assert(out("junk").getAs[Long]("u_types") >
      out("base").getAs[Long]("u_types"))
  }

  test("x173 GNS: identical examples carry zero gradient variance; fixture GNS positive") {
    import spark.implicits._
    val wdf = spark.read.parquet(TrainingData.ensureClfWeights(spark, sf))
    // 200 copies of one doc: every per-example gradient is identical,
    // so tr(Sigma) = 0 exactly (n*S2 = S1^2 per dim) and B = 0
    val docs = (0 until 200).map(i =>
      (i.toLong, "the quick brown fox and the lazy dog"))
      .toDF("doc_id", "text")
    val tf = TrainingData.clfFeatures(docs)
    val out = TrainingData.gradientNoiseOn(spark, tf, wdf, 200L)
      .collect()(0)
    assert(out.getAs[Double]("grad_trace") == 0.0,
      s"identical examples must have zero variance: $out")
    assert(out.isNullAt(out.fieldIndex("gns"))
      || out.getAs[Double]("gns") == 0.0, s"B_simple must vanish: $out")
    // the real corpus is heterogeneous: positive noise scale, and the
    // trace obeys Cauchy-Schwarz
    val fix = TrainingData.defs("x173_gradient_noise")(spark, sf)
      .collect()(0)
    assert(fix.getAs[Double]("grad_trace") >= 0.0)
    assert(fix.getAs[Double]("gns") > 0.0, s"fixture GNS: $fix")
  }

  test("x174 burstiness: same corpus mass, packed beats spread; once-per-doc token is sub-Poisson exactly") {
    import spark.implicits._
    // 100 docs; "burst" puts 50 occurrences into one doc, "spread"
    // puts the same 50 one-per-doc; "tmpl" appears once in EVERY doc
    val docs = (0 until 100).map { i =>
      val burst = if (i == 0) (" burst" * 50) else ""
      val sprd = if (i < 50) " spread" else ""
      (i.toLong, s"tmpl filler$burst$sprd")
    }.toDF("doc_id", "text")
    val rows = TrainingData.tokenBurstinessOn(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val fB = rows("burst").getAs[Double]("fano")
    val fS = rows("spread").getAs[Double]("fano")
    val fT = rows("tmpl").getAs[Double]("fano")
    assert(fB > fS, s"packed mass must over-disperse: $fB vs $fS")
    // exact closed forms: burst F = (100*2500-2500)/(100*50) = 49.5;
    // spread F = (100*50-2500)/(100*50) = 0.5; tmpl (once in all n)
    // F = (100*100-10000)/(100*100) = 0 exactly
    assert(fB == 49.5, s"burst: $fB")
    assert(fS == 0.5, s"spread: $fS")
    assert(fT == 0.0, s"template token must have zero dispersion: $fT")
  }

  test("x175 C2ST: a crafted vocabulary shift alarms; the stationary fixture stays calm") {
    import spark.implicits._
    // late half swaps the vocabulary wholesale — linearly separable
    // in the hashed-bucket features, so held-out accuracy ≈ 1
    val docs = ((0 until 500).map(i =>
        (i.toLong, "alpha beta gamma delta the a of and")) ++
      (500 until 1000).map(i =>
        (i.toLong, "zulu yankee xray whiskey victor uniform tango sierra")))
      .toDF("doc_id", "text")
    val out = TrainingData.driftC2stOn(spark, docs).collect()(0)
    assert(out.getAs[Boolean]("drift"),
      s"vocabulary shift must alarm: $out")
    assert(out.getAs[Double]("test_acc") > 0.9, s"separable shift: $out")
    // stationary corpus: accuracy hugs chance, no alarm
    val fix = TrainingData.defs("x175_drift_c2st")(spark, sf).collect()(0)
    assert(!fix.getAs[Boolean]("drift"),
      s"stationary corpus must stay calm: $fix")
    assert(math.abs(fix.getAs[Double]("test_acc") - 0.5) < 0.1)
  }

  test("x176 embedding drift: identical occupancies score ~0, disjoint cells score ~1 bit; fixture calm") {
    import spark.implicits._
    val spine = (0L until 4L).map(Tuple1(_)).toDF("cell")
    // identical per-cell occupancy across groups → JSD = 0 exactly
    // (every p equals q, all log terms quantize to 0)
    val same = (0L until 4L).flatMap(c =>
      Seq.fill(25)((c, 0L)) ++ Seq.fill(25)((c, 1L)))
      .toDF("cell", "grp")
    val j0 = TrainingData.embedDriftOn(same, spine).collect()(0)
      .getAs[Double]("jsd_bits")
    assert(j0 == 0.0, s"identical populations must score zero: $j0")
    // disjoint: group 0 in cells {0,1}, group 1 in cells {2,3} —
    // JSD approaches 1 bit (Laplace smoothing keeps it just below)
    val disj = ((0L until 2L).flatMap(c => Seq.fill(500)((c, 0L))) ++
      (2L until 4L).flatMap(c => Seq.fill(500)((c, 1L))))
      .toDF("cell", "grp")
    val j1 = TrainingData.embedDriftOn(disj, spine).collect()(0)
      .getAs[Double]("jsd_bits")
    assert(j1 > 0.9 && j1 <= 1.0, s"disjoint populations near 1 bit: $j1")
    // the fixture's halves share the embedding distribution
    val fix = TrainingData.defs("x176_embed_drift")(spark, sf)
      .collect()(0).getAs[Double]("jsd_bits")
    assert(fix >= 0.0 && fix < 0.1, s"stationary fixture: $fix")
  }

  test("x177 packing policies: NFD closed form exact; waste ordering concat <= nfd <= single") {
    import spark.implicits._
    // 100 docs of 100 tokens at b=256: NFD pairs them — 50 bins,
    // 2800 pad; single_doc 100 bins, 15600 pad; concat 40 seqs
    // (10000/256 → 40), 240 pad
    val text = (0 until 100).map(i => s"t$i").mkString(" ")
    val docs = (0 until 100).map(i => (i.toLong, text))
      .toDF("doc_id", "text")
    val out = TrainingData.packingPoliciesOn(spark, docs, 256L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("nfd").getAs[Long]("n_seqs") == 50L
      && out("nfd").getAs[Long]("n_pad") == 2800L, s"nfd: ${out("nfd")}")
    assert(out("single_doc").getAs[Long]("n_seqs") == 100L
      && out("single_doc").getAs[Long]("n_pad") == 15600L)
    assert(out("concat_chunk").getAs[Long]("n_seqs") == 40L
      && out("concat_chunk").getAs[Long]("n_pad") == 240L)
    // fixture: the policies order by construction
    val fix = TrainingData.defs("x177_packing_policies")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("waste")).toMap
    assert(fix("concat_chunk") <= fix("nfd") + 1e-9)
    assert(fix("nfd") <= fix("single_doc") + 1e-9)
  }

  test("x178 PageRank canonical: hub centrality beats min-id on a crafted star") {
    import spark.implicits._
    // hub (id 10) shares exactly half its shingles with each leaf
    // (ids 3, 5); the leaves share nothing — a star whose center is
    // NOT the min id, so the PR policy must disagree with x24's
    val docs = Seq(
      (3L, "t1 t2 t3 t4 t5"),
      (5L, "t4 t5 t6 t7 t8"),
      (10L, "t1 t2 t3 t4 t5 t6 t7 t8"),
      (100L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
    val out = TrainingData.pagerankCanonicalOn(spark, docs).collect()
    assert(out.length == 1, s"one multi-member family: ${out.toSeq}")
    val r = out(0)
    assert(r.getAs[Long]("cluster") == 3L && r.getAs[Long]("size") == 3L)
    assert(r.getAs[Long]("pr_canonical") == 10L, s"hub must win: $r")
    assert(!r.getAs[Boolean]("agree"))
    // fixture families are symmetric triads — every rank ties back to
    // min-id, and sizes are all >= 2 by the output contract
    val fix = TrainingData.defs("x178_pagerank_canonical")(spark, sf)
      .collect()
    assert(fix.nonEmpty)
    fix.foreach(row => assert(row.getAs[Long]("size") >= 2L))
  }

  test("x179 coverage greedy: a contained source is skipped even when it ranks second individually") {
    import spark.implicits._
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    // A holds 100 trigrams; B's 90 are a strict subset of A's (prefix);
    // C holds 30 new ones. Individual ranking A > B > C, but after A
    // the greedy must take C and NEVER pick B (marginal gain 0)
    val docs = Seq(
      (0L, "A", toks("a", 102)),
      (1L, "B", toks("a", 92)),
      (2L, "C", toks("c", 32))).toDF("doc_id", "source", "text")
    val out = TrainingData.coverageSelectOn(spark, docs, 5).collect()
    assert(out.length == 2, s"only positive-gain picks: ${out.toSeq}")
    assert(out(0).getAs[String]("source") == "A"
      && out(0).getAs[Long]("gain") == 100L)
    assert(out(1).getAs[String]("source") == "C"
      && out(1).getAs[Long]("gain") == 30L)
    assert(out(1).getAs[Double]("coverage") == 1.0,
      s"A ∪ C covers everything: ${out(1)}")
    // fixture: marginal gains are non-increasing (submodularity) and
    // coverage is non-decreasing
    val fix = TrainingData.defs("x179_coverage_select")(spark, sf)
      .collect()
    assert(fix.nonEmpty)
    fix.map(_.getAs[Long]("gain")).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, s"gains must not increase")
      case _ =>
    }
  }

  test("x148 margin demotes a crafted hub that raw cosine prefers") {
    import spark.implicits._
    // queries 0,2,4; hub match 101 sits at cos .85 to ALL queries
    // (beating each true match at .80), but its dense neighborhood
    // deflates its margin below the true matches'
    val cand = Seq(
      (0L, 101L, 8500L), (0L, 11L, 8000L), (0L, 13L, 1000L), (0L, 15L, 1000L),
      (2L, 101L, 8500L), (2L, 13L, 8000L), (2L, 11L, 1000L), (2L, 15L, 1000L),
      (4L, 101L, 8500L), (4L, 15L, 8000L), (4L, 13L, 900L), (4L, 11L, 900L))
      .toDF("qid", "match_id", "cu")
    // raw-cos argmax would pick the hub for every query
    assert(cand.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("cu").desc, col("match_id"))))
      .filter(col("rk") === 1).collect()
      .forall(_.getAs[Long]("match_id") == 101L))
    val top = TrainingData.marginTopPairs(cand).collect()
      .map(r => r.getAs[Long]("qid") -> r).toMap
    // margin flips every query to its true (non-hub) match
    assert(top(0L).getAs[Long]("match_id") == 11L)
    assert(top(2L).getAs[Long]("match_id") == 13L)
    assert(top(4L).getAs[Long]("match_id") == 15L)
    top.values.foreach(r => assert(r.getAs[Boolean]("accepted")))
    // carrier: one row per even-id query with candidates; margins
    // positive; accepted ⇔ margin ≥ 1.05
    val rows = TrainingData.defs("x148_margin_mining")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("qid") % 2 == 0)
      assert(r.getAs[Long]("match_id") % 2 == 1)
      assert(r.getAs[Double]("margin") > 0)
      assert(r.getAs[Boolean]("accepted") ==
        (r.getAs[Double]("margin") >= 1.05))
    }
    assert(rows.map(_.getAs[Long]("qid")).distinct.length == rows.length)
  }

  test("x146 k-center: crafted clusters are covered before densifying; radius non-increasing") {
    import graft.ml.Coreset
    // three tight clusters on near-orthogonal axes; greedy must visit
    // all three clusters in the first three picks (farthest-point
    // coverage), then densify — and the covering radius never grows
    val pts: Map[Long, IndexedSeq[Float]] = (0L to 8L).map { id =>
      val axis = (id % 3).toInt
      val v = Array.fill(6)(0.02f * ((id * 7 % 5).toInt + 1))
      v(axis) = 1.0f
      v(axis + 3) = 0.05f * (id / 3).toInt
      id -> v.toIndexedSeq
    }.toMap
    def dist(a: Long, b: Long): Double =
      if (a == b) 0.0
      else Coreset.round6(1.0 - Coreset.cosDouble(pts(a), pts(b)))
    val picks = Coreset.kcenterGreedy(pts.keys.toSeq, dist, 5)
    assert(picks.map(_.step) == Seq(1, 2, 3, 4, 5))
    assert(picks.take(3).map(_.cid % 3).toSet.size == 3,
      s"first 3 picks must hit 3 distinct clusters: ${picks.map(_.cid)}")
    assert(picks.sliding(2).forall(p => p(1).radius <= p(0).radius),
      "covering radius must be non-increasing")
    // after one pick per cluster the radius collapses to intra-cluster
    // scale — an order of magnitude under the inter-cluster floor
    assert(picks(2).radius < picks(0).radius / 5)
    // carrier: 6 picks over the 16 IVF cells, distinct, radius final ≤ first
    val rows = TrainingData.defs("x146_kcenter_coreset")(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("cid")).distinct.length == 6)
    val rads = rows.sortBy(_.getAs[Long]("step")).map(_.getAs[Double]("radius"))
    assert(rads.sliding(2).forall(p => p(1) <= p(0)))
  }

  test("x147 k-anonymity: counts reconcile with an independent class census; risk monotone in k") {
    import graft.text.TextFunctions._
    val cls = Tables.documents(spark, sf)
      .select(col("source"), col("lang"),
        least(call_function("div", tokenCount(col("text")).cast("long"),
          lit(16L)), lit(8L)).as("len_band"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = cls.values.sum
    val rows = TrainingData.defs("x147_k_anonymity")(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      assert(r.getAs[Long]("n_classes") == cls.size.toLong)
      assert(r.getAs[Long]("n_classes_risk") == cls.values.count(_ < k).toLong)
      assert(r.getAs[Long]("n_docs_risk") == cls.values.filter(_ < k).sum)
    }
    assert(rows.map(_.getAs[Long]("n_docs_risk")).sum / 4 <= total)
    val byK = rows.sortBy(_.getAs[Long]("k"))
    assert(byK.sliding(2).forall(p =>
      p(1).getAs[Double]("risk_share") >= p(0).getAs[Double]("risk_share")),
      "risk mass must be monotone in the k target")
  }

  test("x145 WordPiece: likelihood rule diverges from BPE frequency rule on a crafted vocab") {
    import graft.text.Bpe
    // (x,y) is 10x more frequent, but its units are common; (q,z) is
    // rare with rare units — likelihood 3/(3*3)=0.333 beats 10/(10*10)
    // =0.1, so WordPiece and BPE provably pick DIFFERENT first merges
    val vocab = Seq(("xy", 10L), ("qz", 3L))
    val bpe = Bpe.trainOnVocab(vocab, 1)
    val wp = Bpe.trainWordPieceOnVocab(vocab, 1)
    assert(bpe.head.lhs == "x" && bpe.head.rhs == "y")
    assert(wp.head.lhs == "q" && wp.head.rhs == "z")
    assert(wp.head.scoreQ == 3L * Bpe.wpScale / 9L)
    // exhaustion: both words fully merged after 2 steps
    assert(Bpe.trainWordPieceOnVocab(vocab, 50).size == 2)
    // carrier: score column IS the floor-quotient of the count columns,
    // steps are consecutive from 1, merged = lhs+rhs
    val rows = TrainingData.defs("x145_wordpiece_train")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("step") == i + 1L)
      val q = BigInt(r.getAs[Long]("pair_freq")) * Bpe.wpScale /
        (BigInt(r.getAs[Long]("lhs_freq")) * r.getAs[Long]("rhs_freq"))
      assert(r.getAs[Double]("score") == q.toLong.toDouble / 1e12)
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("lhs") + r.getAs[String]("rhs"))
    }
  }

  test("x144 filter attribution: counts reconcile with independently composed rule sets") {
    import graft.text.TextFunctions._
    val rows = TrainingData.defs("x144_filter_attribution")(spark, sf)
      .collect()
    assert(rows.length == 6)
    val byRule = rows.map(r => r.getAs[String]("rule") -> r).toMap
    val nDocs = rows.head.getAs[Long]("n_docs")
    val ruleNames = Seq("lang", "min_len", "quality", "punct", "blocklist")
    // independent recount: each rule as a SEPARATE filter over
    // documents (set algebra on doc_id), not the carrier's row-local
    // flag vector — the same public predicates composed differently
    val docs = Tables.documents(spark, sf)
    val ltoks = filter(wsTokens(lower(col("text"))), w => w =!= "")
    val preds = Map[String, org.apache.spark.sql.Column](
      "lang" -> (col("lang") =!= "en"),
      "min_len" -> (tokenCount(col("text")) < 10),
      "quality" -> (qualityScore(col("text"), Seq("the", "a", "of", "and")) < 0.5),
      "punct" -> (punctRatio(col("text")) > 0.1),
      "blocklist" -> (size(filter(ltoks,
        w => w.isin("slow", "dup", "hash"))) > 0))
    val sets: Map[String, Set[Long]] = preds.map { case (n, p) =>
      n -> docs.filter(p).select("doc_id").collect()
        .map(_.getLong(0)).toSet
    }
    val anySet = sets.values.reduce(_ union _)
    ruleNames.foreach { rn =>
      val r = byRule(rn)
      assert(r.getAs[Long]("n_fail") == sets(rn).size.toLong,
        s"$rn fail count vs independent filter")
      val others = (sets - rn).values.reduce(_ union _)
      assert(r.getAs[Long]("n_unique") == (sets(rn) -- others).size.toLong,
        s"$rn unique count vs set difference")
    }
    val anyRow = byRule("any")
    assert(anyRow.getAs[Long]("n_fail") == anySet.size.toLong)
    assert(anyRow.isNullAt(anyRow.fieldIndex("n_unique")))
    // structural invariants of an attribution table
    assert(docs.count() == nDocs)
    assert(ruleNames.map(rn => byRule(rn).getAs[Long]("n_unique")).sum
      <= anySet.size.toLong)
  }

  test("x143 Vendi: near-orthogonal populations score ≈ m, a collapsed pair scores ≈ m−1") {
    // crafted populations in R^8: near-orthogonal basis vectors with a
    // deterministic jitter (exact orthogonality would start the power
    // iteration exactly perpendicular to the deflated eigenspace)
    val m = 5
    def vecs(dupLast: Boolean) = Array.tabulate(m, 8) { (i, j) =>
      val ii = if (dupLast && i == m - 1) 0 else i
      (if (j == ii) 1.0 else 0.0) + ((ii * 7 + j * 13) % 11) / 500.0
    }
    def gram(v: Array[Array[Double]]) = {
      val nrm = v.map { r => val n = math.sqrt(r.map(x => x * x).sum); r.map(_ / n) }
      Array.tabulate(m, m)((i, j) =>
        nrm(i).zip(nrm(j)).map { case (a, b) => a * b }.sum / m)
    }
    val (hOrth, _) = TrainingData.vendiEntropy(gram(vecs(false)))
    val vOrth = math.exp(hOrth / 1e6)
    assert(vOrth > m - 0.5 && vOrth <= m + 1e-6,
      s"near-orthogonal Vendi $vOrth should approach $m")
    val (hDup, _) = TrainingData.vendiEntropy(gram(vecs(true)))
    val vDup = math.exp(hDup / 1e6)
    assert(vDup < m - 0.5 && vDup > m - 1.6,
      s"one collapsed pair should cost ≈ one effective population: $vDup")
    // carrier: 10 labels, score within [1, m]
    val r = TrainingData.defs("x143_vendi_diversity")(spark, sf).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_labels") == 10L)
    val v = r(0).getAs[Double]("vendi")
    assert(v >= 1.0 && v <= 10.0 + 1e-9, s"vendi $v out of range")
  }

  test("x128 pairing consistency flags exactly the planted divergent copies") {
    val rows = TrainingData.defs("x128_pairing_consistency")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(rows.nonEmpty)
    def h32(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 until 4).map(i => (h(i) & 0xffL) << (8 * (3 - i))).sum
    }
    var planted = 0
    rows.foreach { case (fid, nm, nv, cons) =>
      assert(nm == 2L, s"family $fid size")
      assert((nv == 1L) == cons)
      val divergent = h32((fid + 1000000L).toString) % 13 == 5
      assert(cons == !divergent,
        s"family $fid: consistent=$cons but planted-divergent=$divergent")
      if (divergent) planted += 1
    }
    assert(planted > 0, "the planted slice must be non-empty at this SF")
  }

  test("x129 exact re-rank never loses to plain ADC against brute-force truth") {
    val emb = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def l2q(a: Array[Float], b: Array[Float]): Long =
      math.round(a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum * 1e6)
    val truth = (0L until 5L).filter(emb.contains).map { q =>
      q -> emb.keys.filter(_ != q).toSeq
        .sortBy(n => (l2q(emb(q), emb(n)), n)).take(4).toSet
    }.toMap
    def topSets(name: String, maxRk: Int) =
      TrainingData.defs(name)(spark, sf).collect()
        .filter(_.getInt(3) <= maxRk)
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val refine = topSets("x129_adc_rerank", 4)
    val adc = topSets("x100_ivfpq_query", 4)
    assert(refine.nonEmpty && adc.nonEmpty)
    truth.foreach { case (q, t) =>
      val rRef = refine.getOrElse(q, Set.empty[Long]).intersect(t).size
      val rAdc = adc.getOrElse(q, Set.empty[Long]).intersect(t).size
      // refine keeps every truth member the shortlist contains — the
      // most any ADC-pruned server can deliver — so it can tie but
      // never trail the code-only ranking
      assert(rRef >= rAdc, s"query $q: refine recall $rRef < ADC $rAdc")
    }
  }

  test("x130 quality MAD: histogram medians ≡ driver nearest-rank recompute") {
    val rows = TrainingData.defs("x130_quality_mad")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val q4 = Tables.documents(spark, sf).select(col("source"),
        round(graft.text.TextFunctions.qualityScore(col("text"),
          Seq("the", "a", "of", "and")) * 1e4, 0).cast("long").as("q4"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    def nrMedian(vs: Seq[Long]): Long = {
      val s = vs.sorted; s(((s.size + 1) / 2) - 1)
    }
    rows.foreach { case (src, nDocs, medQ, madQ, nOut) =>
      val vs = q4(src)
      assert(nDocs == vs.size, s"$src size")
      val med = nrMedian(vs)
      val mad = nrMedian(vs.map(v => math.abs(v - med)))
      assert(medQ == med / 1e4, s"$src median")
      assert(madQ == mad / 1e4, s"$src MAD")
      assert(nOut == vs.count(v => math.abs(v - med) > 3 * mad), s"$src outliers")
    }
  }

  test("x131 anneal selection: strict cut keeps ≤10% corpus-wide, per-source counts ≡ driver recompute") {
    val rows = TrainingData.defs("x131_anneal_select")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val totalDocs = rows.map(_._2).sum
    val totalSel = rows.map(_._3).sum
    assert(totalSel * 10 <= totalDocs,
      s"strict > cut must keep at most 10%: $totalSel of $totalDocs")
    assert(totalSel > 0, "the anneal slice must be non-empty")
    // driver recompute off the shared scoring path
    val wdf = spark.read.parquet(TrainingData.ensureClfWeights(spark, sf))
    val docs = Tables.documents(spark, sf)
    val scored = TrainingData.clfScores(TrainingData.clfFeatures(docs), wdf)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("source"), col("pq"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = scored.length
    val cut = scored.map(_._2).sorted.apply(((9 * n + 9) / 10) - 1)
    val bySrc = scored.groupBy(_._1)
    rows.foreach { case (src, nd, ns, _, _) =>
      val vs = bySrc(src).map(_._2)
      assert(nd == vs.length, s"$src docs")
      assert(ns == vs.count(_ > cut), s"$src selected")
    }
  }

  test("x132 pagination stitch recovers every planted page split") {
    val edges = TrainingData.defs("x132_pagination_stitch")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.nonEmpty)
    val planted = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n"))
      .filter(col("doc_id") % 5 === 2 && col("n") >= 24)
      .collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty, "the fixture must contain splittable docs")
    planted.foreach { id =>
      assert(edges.contains((id, id + 4000000L)),
        s"planted continuation $id -> ${id + 4000000L} not recovered")
    }
  }

  test("x133 DSIR resampling: per-source keeps ≡ driver replica, max-weight doc always kept") {
    val rows = TrainingData.defs("x133_dsir_resample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // replica off x42's published weights
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val wq = TrainingData.defs("x42_dsir_weights")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        math.round(r.getDouble(2) * 1e4)).toMap
    val mxw = wq.values.max
    def h32(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 until 4).map(i => (h(i) & 0xffL) << (8 * (3 - i))).sum
    }
    def kept(id: Long): Boolean = {
      val pq = BigDecimal.decimal(math.exp((wq(id) - mxw).toDouble / 1e4) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      h32(id.toString) * 1000000L < pq * 4294967296L
    }
    val bySrc = wq.keys.groupBy(docs)
    rows.foreach { case (src, nd, nk) =>
      val ids = bySrc(src)
      assert(nd == ids.size, s"$src docs")
      assert(nk == ids.count(kept), s"$src kept")
    }
    // p = exp(0) = 1 at the argmax: the most-target-like doc survives
    // any hash draw
    val best = wq.maxBy(_._2)._1
    assert(kept(best), "max-weight doc must always be kept")
    assert(rows.map(_._3).sum > 0 && rows.map(_._3).sum < rows.map(_._2).sum,
      "resampling must keep a strict, non-empty subset on the fixture")
  }

  test("x134 source run overlap ≡ driver set intersection of winnowed fingerprints") {
    val docs = Tables.documents(spark, sf)
    val fs = graft.dedup.NearDup.winnowedFingerprints(
        docs.select(col("doc_id"), col("text")))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("source"), explode(col("fps")).as("fp")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val sets = fs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = TrainingData.defs("x134_source_run_overlap")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3))))
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), (shared, coef)) =>
      assert(a < b, s"pair order $a/$b")
      assert(shared == sets(a).intersect(sets(b)).size.toLong, s"$a-$b shared")
      assert(coef > 0.0 && coef <= 1.0, s"$a-$b coef $coef")
    }
    // every genuinely overlapping pair is emitted (the join drops only
    // zero-overlap pairs)
    val want = sets.keySet.toSeq.sorted.combinations(2).count {
      case Seq(a, b) => sets(a).intersect(sets(b)).nonEmpty
      case _ => false
    }
    assert(rows.size == want, s"emitted ${rows.size} of $want overlapping pairs")
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}

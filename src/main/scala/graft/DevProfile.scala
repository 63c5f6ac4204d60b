package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro profiler for the classifier trainer path (not part
  * of the engine surface; removed before round close). */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm the session
    spark.range(1000).selectExpr("sum(id)").count()
    val (tf, n) = t("qualityClfTf build") {
      val x = graft.queries.TrainingData.qualityClfTf(spark, sfDir)
      x._1.count(); x
    }
    t("20-step trainer") {
      graft.queries.TrainingData.trainQualityClf(tf, n)
    }
    t("20-step trainer (2nd)") {
      graft.queries.TrainingData.trainQualityClf(tf, n)
    }
    // replicate one step, timing the pieces
    val w = Array.fill(68)(0.0)
    for (i <- 1 to 3) {
      val wdf = t(s"step$i createDataFrame") {
        spark.createDataFrame(Seq(Tuple1(w.toSeq))).toDF("ws")
      }
      val joined = t(s"step$i plan build") {
        tf.crossJoin(broadcast(wdf))
          .withColumn("zq",
            aggregate(zip_with(col("ws"), col("xs"),
              (wc, x) => round(wc * x * lit(1e9), 0).cast("long")),
              lit(0L), (acc, v) => acc + v))
          .select(posexplode(transform(col("xs"), x =>
            round((round((lit(1.0) / (lit(1.0)
              + exp(-(col("zq").cast("double") / 1e9)))) * 1e6, 0)
              .cast("long").cast("double") / 1e6
              - col("y").cast("double")) * x * 1e6, 0).cast("long")))
            .as(Seq("bucket", "gc")))
          .groupBy(col("bucket")).agg(sum(col("gc")).as("gq"))
      }
      t(s"step$i collect") { joined.collect() }
      // static-unroll variant: zq as 68 codegen terms, gradient as one
      // 68-column global aggregate — no HOF, no explode, no shuffle
      val static = t(s"step$i static plan") {
        val zq = (0 until 68).map(b =>
          round(col("ws").getItem(b) * col("xs").getItem(b) * lit(1e9), 0)
            .cast("long")).reduce(_ + _)
        val p = round((lit(1.0) / (lit(1.0)
          + exp(-(col("zq").cast("double") / 1e9)))) * 1e6, 0)
          .cast("long").cast("double") / 1e6
        tf.crossJoin(broadcast(wdf))
          .withColumn("zq", zq)
          .agg(
            sum(round((p - col("y").cast("double"))
              * col("xs").getItem(0) * 1e6, 0).cast("long")).as("g0"),
            (1 until 68).map(b =>
              sum(round((p - col("y").cast("double"))
                * col("xs").getItem(b) * 1e6, 0).cast("long")).as(s"g$b")): _*)
      }
      t(s"step$i static collect") { static.collect() }
      val aggOnly = t(s"step$i aggonly plan") {
        tf.agg(sum(round(col("xs").getItem(0) * 1e6, 0).cast("long")).as("g0"),
          (1 until 68).map(b =>
            sum(round(col("xs").getItem(b) * 1e6, 0).cast("long")).as(s"g$b")): _*)
      }
      t(s"step$i aggonly collect") { aggOnly.collect() }
    }
    println(s"[prof] tf partitions = ${tf.rdd.getNumPartitions}")
    val tf1 = t("coalesce(1) checkpoint") {
      val x = tf.coalesce(1).localCheckpoint(); x.count(); x
    }
    for (i <- 1 to 3) {
      val aggOnly1 = tf1.agg(
        sum(round(col("xs").getItem(0) * 1e6, 0).cast("long")).as("g0"),
        (1 until 68).map(b =>
          sum(round(col("xs").getItem(b) * 1e6, 0).cast("long")).as(s"g$b")): _*)
      t(s"v$i aggonly-1part collect") { aggOnly1.collect() }
      // literal weights, HOF zq + posexplode gradient, 1 partition
      val lim = typedlit(w.toSeq)
      val hof = tf1
        .withColumn("zq",
          aggregate(zip_with(lim, col("xs"),
            (wc, x) => round(wc * x * lit(1e9), 0).cast("long")),
            lit(0L), (acc, v) => acc + v))
        .select(posexplode(transform(col("xs"), x =>
          round((round((lit(1.0) / (lit(1.0)
            + exp(-(col("zq").cast("double") / 1e9)))) * 1e6, 0)
            .cast("long").cast("double") / 1e6
            - col("y").cast("double")) * x * 1e6, 0).cast("long")))
          .as(Seq("bucket", "gc")))
        .groupBy(col("bucket")).agg(sum(col("gc")).as("gq"))
      t(s"v$i literal+hof-1part collect") { hof.collect() }
    }
    // observe variant: gradient sums ride an AggregatingAccumulator —
    // one stage, zero exchanges, weights via broadcast relation so the
    // plan (and codegen) is identical across steps
    for (i <- 1 to 5) {
      val wdf = spark.createDataFrame(Seq(Tuple1(w.toSeq))).toDF("ws")
      t(s"o$i observe step") {
        val zq = (0 until 68).map(b =>
          round(col("ws").getItem(b) * col("xs").getItem(b) * lit(1e9), 0)
            .cast("long")).reduce(_ + _)
        val p = round((lit(1.0) / (lit(1.0)
          + exp(-(col("zq").cast("double") / 1e9)))) * 1e6, 0)
          .cast("long").cast("double") / 1e6
        val obs = new org.apache.spark.sql.Observation()
        tf1.crossJoin(broadcast(wdf))
          .withColumn("zq", zq)
          .observe(obs,
            sum(round((p - col("y").cast("double"))
              * col("xs").getItem(0) * 1e6, 0).cast("long")).as("g0"),
            (1 until 68).map(b =>
              sum(round((p - col("y").cast("double"))
                * col("xs").getItem(b) * 1e6, 0).cast("long")).as(s"g$b")): _*)
          .count()
        val row = obs.get
        row("g0")
      }
    }
    // HOF+explode step with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (i <- 1 to 5) {
      val wdf = spark.createDataFrame(Seq(Tuple1(w.toSeq))).toDF("ws")
      val hof = tf1.crossJoin(broadcast(wdf))
        .withColumn("zq",
          aggregate(zip_with(col("ws"), col("xs"),
            (wc, x) => round(wc * x * lit(1e9), 0).cast("long")),
            lit(0L), (acc, v) => acc + v))
        .select(posexplode(transform(col("xs"), x =>
          round((round((lit(1.0) / (lit(1.0)
            + exp(-(col("zq").cast("double") / 1e9)))) * 1e6, 0)
            .cast("long").cast("double") / 1e6
            - col("y").cast("double")) * x * 1e6, 0).cast("long")))
          .as(Seq("bucket", "gc")))
        .groupBy(col("bucket")).agg(sum(col("gc")).as("gq"))
      t(s"n$i noaqe hof step") { hof.collect() }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // split a step's collect into planning vs execution
    for (i <- 1 to 3) {
      val wdf = spark.createDataFrame(Seq(Tuple1(w.toSeq))).toDF("ws")
      val hof = tf1.crossJoin(broadcast(wdf))
        .withColumn("zq",
          aggregate(zip_with(col("ws"), col("xs"),
            (wc, x) => round(wc * x * lit(1e9), 0).cast("long")),
            lit(0L), (acc, v) => acc + v))
        .select(posexplode(transform(col("xs"), x =>
          round((round((lit(1.0) / (lit(1.0)
            + exp(-(col("zq").cast("double") / 1e9)))) * 1e6, 0)
            .cast("long").cast("double") / 1e6
            - col("y").cast("double")) * x * 1e6, 0).cast("long")))
          .as(Seq("bucket", "gc")))
        .groupBy(col("bucket")).agg(sum(col("gc")).as("gq"))
      t(s"p$i plan-to-physical") { hof.queryExecution.executedPlan }
      t(s"p$i execute") { hof.collect() }
    }
    // full-codegen step: static zq unroll + plain posexplode + post-
    // explode gc — no higher-order functions anywhere
    for (i <- 1 to 5) {
      val wdf = spark.createDataFrame(Seq(Tuple1(w.toSeq))).toDF("ws")
      val zq = (0 until 68).map(b =>
        round(col("ws").getItem(b) * col("xs").getItem(b) * lit(1e9), 0)
          .cast("long")).reduce(_ + _)
      val p = round((lit(1.0) / (lit(1.0)
        + exp(-(col("zq").cast("double") / 1e9)))) * 1e6, 0)
        .cast("long").cast("double") / 1e6
      val fc = tf1.crossJoin(broadcast(wdf))
        .withColumn("zq", zq)
        .select(col("y"), col("zq"), posexplode(col("xs")).as(Seq("bucket", "x")))
        .select(col("bucket"),
          round((p - col("y").cast("double")) * col("x") * 1e6, 0)
            .cast("long").as("gc"))
        .groupBy(col("bucket")).agg(sum(col("gc")).as("gq"))
      t(s"f$i fullcodegen step") { fc.collect() }
    }
    // trajScored isolation
    {
      val traj = spark.read.parquet(
        graft.queries.TrainingData.ensureClfTrajectory(spark, sfDir))
      val trow = graft.queries.TrainingData.trajRow(traj)
      val base = tf.crossJoin(broadcast(trow))
      val pqs = (0 until 20).map { tt =>
        val ws = col("snaps").getItem(tt).getField("ws")
        val zq = (0 until 68).map(b =>
          round(ws.getItem(b) * col("xs").getItem(b) * lit(1e9), 0)
            .cast("long")).reduce(_ + _)
        round((lit(1.0) / (lit(1.0)
          + exp(-(zq.cast("double") / 1e9)))) * 1e6, 0)
          .cast("long").as(s"pq_${tt + 1}")
      }
      val scored = base.select(col("doc_id") +: col("y") +: pqs: _*)
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      t("trajScored noop r1") { noop(scored) }
      t("trajScored noop r2") { noop(scored) }
      val ptq = (1 to 20).map(tt =>
        when(col("y") === 1L, col(s"pq_$tt"))
          .otherwise(lit(1000000L) - col(s"pq_$tt")))
      val perDoc = scored.select(col("doc_id"), col("y"),
        ptq.reduce(_ + _).as("sp"),
        ptq.map(c => c * c).reduce(_ + _).as("spp"))
      t("perDoc noop r1") { noop(perDoc) }
      t("perDoc noop r2") { noop(perDoc) }
    }
    // x111 noop check
    for (i <- 1 to 2) {
      t(s"x111 count $i") { graft.queries.TrainingData.defs("x111_alignment_score")(spark, sfDir).count() }
      t(s"x111 noop $i") { graft.queries.TrainingData.defs("x111_alignment_score")(spark, sfDir)
        .write.format("noop").mode("overwrite").save() }
    }
    // x99b piecewise
    {
      import graft.core.Tables
      val (mat, _, _) = t("opq covariance") {
        graft.ml.Opq.covariance(Tables.embeddings(spark, sfDir)) }
      val rows = t("eigensolve+rows") { graft.ml.Opq.rotationRows(
        graft.ml.Opq.eigensolve(mat, mat.length), m = 8, dsub = 8) }
      val emb = t("rotate+checkpoint") {
        val e = Tables.embeddings(spark, sfDir).repartition(spark.sparkContext.defaultParallelism)
          .select(col("vec_id"),
            graft.ml.Opq.rotateCol(col("embedding"), rows).as("embedding"))
          .localCheckpoint()
        e.count(); e }
      val cents = t("trainCodebook") { val c = graft.ml.PqIndex.trainCodebook(emb); c.count(); c }
      val codes = t("encode+count") { val c = graft.ml.PqIndex.encode(emb, cents).localCheckpoint(); c.count(); c }
      t("x99b full") { graft.queries.TrainingData.defs("x99b_opq_recall")(spark, sfDir).count() }
      t("x99b full2") { graft.queries.TrainingData.defs("x99b_opq_recall")(spark, sfDir).count() }
    }
    // trajectory consumer timing, count vs noop
    for (q <- Seq("x157_cartography","x158_forgetting_events",
        "x159_tracin_self","x168_curriculum_schedule")) {
      t(s"$q count1") { graft.queries.TrainingData.defs(q)(spark, sfDir).count() }
      t(s"$q count2") { graft.queries.TrainingData.defs(q)(spark, sfDir).count() }
      t(s"$q noop1") { graft.queries.TrainingData.defs(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save() }
      t(s"$q noop2") { graft.queries.TrainingData.defs(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}

package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M2 faithful port: per-group RandomForest regression
  * (`ETL - Análise Preditiva de Dados - Machine Learning.py:89-154`) —
  * one model per group over lag features (lag_1 / media_3m / media_6m
  * / ano / mes, the same features the reference view feeds it),
  * chronological 80/20 split, per-group holdout MAE.
  *
  * Control flow mirrors the reference: an explicit loop over groups,
  * each fitting its own forest (the reference does exactly this in
  * Python). Scale note: each group's series is tiny (monthly points),
  * so at 100 TB the parallelism axis is ACROSS groups — that path is
  * IMPLEMENTED in [[DistributedGroupLearner]] (groupByKey+mapGroups
  * with a local in-JVM forest, no driver involvement, any group
  * cardinality); this module stays as the Spark-ML parity port of
  * the reference's loop, capped at [[MaxDriverLoopGroups]].
  *
  * `m2_group_regression` (queries/MlEtl) remains the oracle-checkable
  * deterministic variant; this module is the Spark-ML parity path
  * (validated by invariants in MlSpec, not a hash oracle — forests
  * are not cross-engine reproducible).
  */
object GroupForest {

  final case class GroupModelReport(grupo: Long, n_treino: Long,
      n_teste: Long, mae: Double)

  /** Hard ceiling on the driver-side model loop: beyond this the
    * per-group fit MUST move to groupByKey+mapGroups with a local
    * learner (see scaladoc) — a driver loop over 10^5 groups is a
    * driver bottleneck, not a distributed plan. */
  val MaxDriverLoopGroups = 1000

  /** Train one forest per group (first `maxGroups` groups by key) and
    * report holdout MAE per group. */
  def trainPerGroup(s: SparkSession, d: String, maxGroups: Int = 5,
      numTrees: Int = 30): DataFrame = {
    import s.implicits._
    require(maxGroups <= MaxDriverLoopGroups,
      s"maxGroups=$maxGroups exceeds the driver-loop ceiling " +
        s"($MaxDriverLoopGroups); use a groupByKey+mapGroups learner " +
        "for high-cardinality group columns")
    val feats = graft.queries.Windows.w12LagFeatures(s, d)
      .filter(col("lag_1").isNotNull && col("media_6m").isNotNull)
    val groups = feats.select(col("c_nationkey").cast("long")).distinct()
      .orderBy(col("c_nationkey")).limit(maxGroups + 1)
      .collect().map(_.getLong(0))
    if (groups.length > maxGroups)
      System.err.println(s"[GroupForest] more than $maxGroups groups " +
        s"exist; training only the first $maxGroups (raise maxGroups " +
        "or move to the distributed mapGroups path)")
    val trainGroups = groups.take(maxGroups)
    val assembler = new VectorAssembler()
      .setInputCols(Array("lag_1", "media_3m", "media_6m", "ano", "mes"))
      .setOutputCol("features")
    val reports = trainGroups.map { g =>
      // per-group frame is a tiny monthly series — single-partition
      // window for the chronological index is intentional here
      val gd = feats.filter(col("c_nationkey") === g)
        .withColumn("idx",
          row_number().over(Window.orderBy(col("ano"), col("mes"))))
      val n = gd.count()
      val cut = math.max((n * 0.8).toInt, 1)
      val train = assembler.transform(gd.filter(col("idx") <= cut))
      val test = assembler.transform(gd.filter(col("idx") > cut))
      val model = new RandomForestRegressor()
        .setLabelCol("total").setFeaturesCol("features")
        .setNumTrees(numTrees).setSeed(42L)
        .fit(train)
      val mae =
        if (test.isEmpty) Double.NaN
        else model.transform(test)
          .agg(avg(abs(col("prediction") - col("total")))).first().getDouble(0)
      GroupModelReport(g, cut.toLong, n - cut, mae)
    }
    reports.toSeq.toDF()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorExpressions

/** The native expression must be reachable from SQL text — both via
  * session registration and via the SparkSessionExtensions config
  * (the cluster-deployment path). */
class ExtensionsSpec extends AnyFunSuite {

  test("cosine_sim registered on an existing session evaluates in SQL text") {
    val spark = TestSpark.spark
    VectorExpressions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                           array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    val orth = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                           array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c""")
      .collect()(0).getDouble(0)
    assert(math.abs(orth) < 1e-12)
  }

  test("GraftExtensions registers its injection without error") {
    // A fresh session with spark.sql.extensions can't be created here
    // (getOrCreate reuses the suite's active session), so assert the
    // injection hook itself: applying the extensions class to a
    // builder-level SparkSessionExtensions must succeed and be
    // idempotent. SQL-text evaluation is covered by the test above.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    val g = new GraftExtensions
    g.apply(ext)
    g.apply(ext) // re-registration must not throw
  }

  test("cosine_sim rejects non-float-array inputs") {
    val spark = TestSpark.spark
    VectorExpressions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1, 2), array(3, 4))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<float>") ||
      err.getMessage.toLowerCase.contains("cosine_sim"))
  }
}

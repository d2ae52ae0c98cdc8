package graft

import org.apache.spark.sql.graft.GraftExtensions

/** SQL-surface registration of native expressions. */
class ExtensionsSpec extends SparkSpec {

  test("cosine_sim callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c1,
        |       cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c0
        |""".stripMargin).head()
    assert(row.getDouble(0) == 1.0)
    assert(row.getDouble(1) == 0.0)
  }

  test("extensions class injects without error and codegen path evaluates") {
    // construction-time wiring (the injectFunction list is consumed on
    // session build; here we exercise the builder function itself)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // codegen path over a real column
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val c = spark.sql("SELECT cosine_sim(a, b) FROM vecs").head().getDouble(0)
    assert(math.abs(c - 10.0 / 14.0) < 1e-12)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** SparkSessionExtensions registration: the native vector expressions are
  * callable from plain SQL in a session built with GraftExtensions. The
  * test builds a fresh SparkSession over the shared SparkContext
  * (clearing the default so getOrCreate doesn't short-circuit past the
  * extension wiring), and restores the shared session afterwards without
  * stopping the context. */
class ExtensionsSpec extends SparkTestBase {

  test("vec_dot / vec_l2sq resolve in spark.sql via injected functions") {
    val shared = spark // force init of the shared session/context
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .withExtensions(new org.apache.spark.sql.graftnative.GraftExtensions)
        .getOrCreate() // reuses the existing SparkContext, new session state
      val r = ext.sql(
        """SELECT
          |  vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
          |          array(cast(3.0 as float), cast(4.0 as float))) AS d,
          |  vec_l2sq(array(cast(0.0 as float), cast(3.0 as float)),
          |           array(cast(4.0 as float), cast(3.0 as float))) AS l2,
          |  vec_cosine(array(cast(2.0 as float), cast(0.0 as float)),
          |             array(cast(5.0 as float), cast(0.0 as float))) AS cos
          |""".stripMargin).head()
      assert(r.getDouble(0) === 11.0)
      assert(r.getDouble(1) === 16.0)
      assert(r.getDouble(2) === 1.0) // parallel vectors, scale-invariant
      // the shared session must NOT see the injected names (isolation)
      intercept[Exception](shared.sql("SELECT vec_dot(array(), array())").head())
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions path (a STATIC conf — set on the suite's
  * shared context): every session built on the context must expose the
  * native functions in SQL with no register() calls. `newSession()`
  * gives a pristine temp-function registry, so a pass here can't be
  * masked by another suite's register(spark) side effects.
  */
class ExtensionsSpec extends SparkSuite {

  test("GraftExtensions injects vec_dot/word_shingles/minhash_buckets") {
    val s2: SparkSession = spark.newSession()
    val r = s2.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       size(word_shingles('a b c d')) AS nsh,
        |       size(minhash_buckets(array('x', 'y', 'z'))) AS nbk""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) === 11.0)
    assert(r.getInt(1) === 2)
    assert(r.getInt(2) === 8)
  }
}

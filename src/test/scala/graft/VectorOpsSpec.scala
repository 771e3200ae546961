package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.DotProduct
import graft.queries.Similarity

/** Native codegen DotProduct vs the declarative zip_with/aggregate
  * twin: bit-identical results (same sequential summation order), and
  * the expression must survive inside whole-stage codegen.
  */
class VectorOpsSpec extends SparkSuite {

  test("vec_dot bit-identical to the lambda formulation over real embeddings") {
    DotProduct.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(200)
    val both = e.select(
      call_function("vec_dot", col("v"), col("v")).as("native"),
      Similarity.dotLambda(col("v"), col("v")).as("lambda")).collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native=${r.getDouble(0)} lambda=${r.getDouble(1)}"))
  }

  test("vec_dot handles null input and length mismatch") {
    DotProduct.register(spark)
    val df = spark.sql(
      """SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS a,
        |       vec_dot(array(1.0d, 2.0d, 3.0d), array(10.0d, 10.0d)) AS b""".stripMargin)
    val r = df.collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 30.0)
  }

  test("vec_dot runs inside WholeStageCodegen (not fallback)") {
    DotProduct.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("embedding").cast("array<double>").as("v"))
      .select(call_function("vec_dot", col("v"), col("v")).as("d"))
    // codegen'd operators render as "*(n) Op"; a CodegenFallback
    // expression would leave the vec_dot Project unstarred
    val plan = e.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("vec_dot") && l.contains("*(")), plan)
    // and it must actually compute
    assert(e.agg(sum("d")).collect()(0).getDouble(0) > 0.0)
  }
}

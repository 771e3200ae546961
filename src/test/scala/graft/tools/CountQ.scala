package graft.tools
object CountQ {
  def main(args: Array[String]): Unit = {
    println(s"[count] queries=${graft.SparkEntry.queries.size} oracle=${graft.SparkEntry.oracleSql.size} bench=${graft.SparkEntry.benchQueries.size}")
  }
}

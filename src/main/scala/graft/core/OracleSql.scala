package graft.core

/** DuckDB execution-hint pass over the machine-authored oracle SQL.
  *
  * DuckDB inlines a plain CTE at every reference site; in the long
  * machine-composed chains this registry emits (curation pipelines
  * reuse a stage frame 5-8×, each reuse re-expanding the whole
  * upstream chain) the scan tree grows EXPONENTIALLY in chain depth —
  * `pipeline_pretrain_dsir` measured 475 s at sf0.001 against 0.2 s
  * with shared CTEs materialized, and two driver rounds' correctness
  * artifacts arrived empty because the gate outgrew its wall-time
  * budget. `AS MATERIALIZED` is purely an execution hint (evaluate
  * once, reuse the result) — result rows are unchanged by definition.
  *
  * [[materializeShared]] rewrites ONE statement: every top-level CTE
  * that is (a) referenced more than once, (b) not already carrying a
  * MATERIALIZED / NOT MATERIALIZED hint, and (c) not self-referential
  * (a RECURSIVE member must stay plain) gets the hint. Nested WITH
  * blocks inside CTE bodies are left alone — hand-tuned oracles
  * (pca/embed_project) already carry their own marks. Applied
  * registry-wide at the [[graft.SparkEntry.oracleSql]] aggregation
  * point so every future oracle inherits the guarantee.
  */
object OracleSql {

  private def isIdentChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Index just after the ')' matching the '(' at `start`, skipping
    * '…' and "…" literals (with doubled-quote escapes). -1 if
    * unbalanced.
    */
  private def skipParens(sql: String, start: Int): Int = {
    val n = sql.length
    var i = start
    var depth = 0
    while (i < n) {
      sql(i) match {
        case '(' => depth += 1; i += 1
        case ')' =>
          depth -= 1; i += 1
          if (depth == 0) return i
        case q @ ('\'' | '"') =>
          i += 1
          var closed = false
          while (i < n && !closed) {
            if (sql(i) == q) {
              if (i + 1 < n && sql(i + 1) == q) i += 2 // '' escape
              else { closed = true; i += 1 }
            } else i += 1
          }
        case _ => i += 1
      }
    }
    -1
  }

  def materializeShared(sql: String): String = {
    val n = sql.length
    def skipWs(i0: Int): Int = {
      var i = i0
      while (i < n && sql(i).isWhitespace) i += 1
      i
    }
    def wordAt(i: Int, w: String): Boolean =
      i >= 0 && i + w.length <= n &&
        sql.regionMatches(true, i, w, 0, w.length) &&
        (i + w.length == n || !isIdentChar(sql(i + w.length))) &&
        (i == 0 || !isIdentChar(sql(i - 1)))

    var i = skipWs(0)
    if (!wordAt(i, "WITH")) return sql
    i = skipWs(i + 4)
    if (wordAt(i, "RECURSIVE")) i = skipWs(i + 9)

    final case class Cte(name: String, insertAt: Int,
        bodyStart: Int, bodyEnd: Int, hinted: Boolean)
    val items = scala.collection.mutable.ArrayBuffer.empty[Cte]
    var more = true
    while (more) {
      more = false
      val ns = i
      while (i < n && isIdentChar(sql(i))) i += 1
      if (i > ns) {
        val name = sql.substring(ns, i)
        i = skipWs(i)
        if (i < n && sql(i) == '(') { // optional column list
          val e = skipParens(sql, i)
          if (e < 0) return sql
          i = skipWs(e)
        }
        if (wordAt(i, "AS")) {
          i = skipWs(i + 2)
          val insertAt = i
          var hinted = false
          if (wordAt(i, "MATERIALIZED")) { hinted = true; i = skipWs(i + 12) }
          else if (wordAt(i, "NOT")) {
            hinted = true
            i = skipWs(i + 3)
            if (wordAt(i, "MATERIALIZED")) i = skipWs(i + 12)
          }
          if (i < n && sql(i) == '(') {
            val bodyEnd = skipParens(sql, i)
            if (bodyEnd < 0) return sql
            items += Cte(name, insertAt, i, bodyEnd, hinted)
            i = skipWs(bodyEnd)
            if (i < n && sql(i) == ',') { i = skipWs(i + 1); more = true }
          }
        }
      }
    }
    if (items.isEmpty) return sql

    def countWord(hay: String, w: String): Int = {
      var c = 0
      var j = hay.indexOf(w)
      while (j >= 0) {
        val before = j == 0 || !isIdentChar(hay(j - 1))
        val after = j + w.length >= hay.length || !isIdentChar(hay(j + w.length))
        if (before && after) c += 1
        j = hay.indexOf(w, j + 1)
      }
      c
    }

    val marks = items.filter { it =>
      !it.hinted &&
        countWord(sql, it.name) - 1 >= 2 && // refs beyond the definition
        countWord(sql.substring(it.bodyStart, it.bodyEnd), it.name) == 0 // not recursive
    }
    if (marks.isEmpty) return sql
    val sb = new StringBuilder(sql)
    marks.sortBy(-_.insertAt).foreach(it =>
      sb.insert(it.insertAt, "MATERIALIZED "))
    sb.toString
  }
}

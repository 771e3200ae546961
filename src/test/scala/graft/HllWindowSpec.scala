package graft

import graft.queries.Sketches

/** hll_window contracts: the register-max merge over the trailing
  * window IS the sketch of the window's union (exact identity — the
  * reason sketches answer sliding windows without revisiting raw
  * ids), so the 7-day estimate must EQUAL a one-shot estimate over
  * the union; and it stays within the m=256 error envelope of the
  * exact trailing distinct.
  */
class HllWindowSpec extends SparkSuite {

  test("hll_window: merge ≡ union sketch; estimate within the error envelope") {
    val rows = graft.core.Tables.events(spark, sfDir)
      .selectExpr("ts DIV 86400000000000 AS day", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val days = rows.map(_._1).distinct
    // sequential md5 HLL over an id set — the oracle chain in JVM form
    def reg(ids: Iterable[Long]): Map[Long, Int] =
      ids.groupBy { id =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"hll:$id".getBytes("UTF-8"))
        val hex = md.take(6).map(x => f"${x & 0xff}%02x").mkString
        java.lang.Long.parseLong(hex, 16) % 256
      }.map { case (j, g) =>
        j -> g.map { id =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(s"hll:$id".getBytes("UTF-8"))
          val hex = md.take(6).map(x => f"${x & 0xff}%02x").mkString
          val w = java.lang.Long.parseLong(hex, 16) / 256
          41 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        }.max.toInt
      }
    def estimate(regs: Map[Long, Int]): Long = {
      val z = regs.values.map(m => 1.0 / (1L << m).toDouble).sum
      val vZero = 256 - regs.size
      val raw = ((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0) / (z + vZero.toDouble)
      val est = if (raw <= 640.0 && vZero > 0)
        256.0 * math.log(256.0 / vZero.toDouble) else raw
      math.floor(est + 0.5).toLong
    }
    val got = Sketches.hllWindow(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == days.toSet)
    days.foreach { d =>
      val windowIds = rows.filter(t => t._1 >= d - 6 && t._1 <= d).map(_._2).toSet
      val oneShot = estimate(reg(windowIds))
      val (exactDay, est7) = got(d)
      assert(est7 == oneShot, s"day $d merge != union sketch")
      assert(exactDay == rows.filter(_._1 == d).map(_._2).distinct.length.toLong)
      val exact7 = windowIds.size.toLong
      assert(math.abs(est7 - exact7).toDouble <= 0.30 * exact7 + 16,
        s"day $d estimate $est7 outside envelope of $exact7")
    }
  }
}

package graft.bench

/** Scratch diagnostic: single-thread CPU cost of the q37 kernel
  * (cellToChildren at +2 then compact) and its halves. No Spark. */
object K37Probe {
  def main(args: Array[String]): Unit = {
    import graft.index.{H3, H3Cover}
    val cells = (0 until 2000).map { i =>
      graft.index.H3Geo.latLngToCell(-60.0 + (i % 120), -170.0 + (i % 340), 7)
    }
    def t(label: String)(f: => Long): Unit = {
      f; f // warmup
      val t0 = System.nanoTime()
      val s = f
      println(f"$label%-20s ${(System.nanoTime() - t0) / 1e9 / cells.size * 1e6}%.1f us/row (s=$s)")
    }
    t("children+compact") {
      var s = 0L
      cells.foreach { c =>
        val kids = H3.cellToChildren(c, H3.resolution(c) + 2)
        s += H3Cover.compact(kids.toSet).size
      }
      s
    }
    t("children only") {
      var s = 0L
      cells.foreach(c => s += H3.cellToChildren(c, H3.resolution(c) + 2).size)
      s
    }
    t("compact only") {
      var s = 0L
      val kidSets = cells.map(c => H3.cellToChildren(c, H3.resolution(c) + 2).toSet)
      val t0 = System.nanoTime()
      kidSets.foreach(k => s += H3Cover.compact(k).size)
      s + (System.nanoTime() - t0) / 1000000000L
    }
    t("isPentagon x49") {
      var s = 0L
      cells.foreach { c => var i = 0; while (i < 49) { if (H3.isPentagon(c)) s += 1; i += 1 } }
      s
    }
  }
}

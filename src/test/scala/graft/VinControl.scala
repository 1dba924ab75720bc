package graft
object VinControl {
  def main(a: Array[String]): Unit = {
    val threads = a(0).toInt
    val perThread = 2000000
    def work(seed: Int): Double = {
      var s = 0.0
      var i = 0
      while (i < perThread) {
        val lon = -170.0 + ((seed * 7 + i) % 340)
        val lat = -80.0 + ((seed * 13 + i) % 160)
        s += graft.geom.Vincenty.distance(lon, lat, 10.0, 20.0).getOrElse(0.0)
        i += 1
      }
      s
    }
    work(99) // warmup JIT
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { k => val t = new Thread(() => work(k)); t.start(); t }
    ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"threads=$threads total=${threads.toLong * perThread} sec=$sec%.2f rate=${threads.toLong * perThread / sec}%.0f")
  }
}

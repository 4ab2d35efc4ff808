package graft

/** Standalone host-window fingerprint: prints one line
  * `WINDOW_MARK membw_gbps_1t=<v>` — the same 1-thread memory-streaming
  * marker `graft.Bench` takes before each crawl sweep (BASELINE.md
  * "calm-window" protocol: ≈15-18 GB/s quiet host, ≈4-6 GB/s contended).
  * Used between the legs of paired scaling measurements (e.g. the
  * local-cluster N→4N protocol) so every recorded rate carries the window
  * it was measured in. Runs ~0.5 s, no Spark session.
  */
object WindowMark {
  def main(args: Array[String]): Unit = {
    val ms = if (args.nonEmpty) args(0).toLong else 500L
    println(f"WINDOW_MARK membw_gbps_1t=${memStream1(ms) / 1e9}%.2f")
  }

  /** 1-thread copy of Bench.memStream (kept private there; this main must
    * run from the plain jar without pulling Bench's query table in). */
  private def memStream1(ms: Long): Double = {
    val words = 8 * 1024 * 1024 // 64 MB — far beyond LLC
    val a = Array.tabulate(words)(k => k.toLong) // first-touch before clock
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile var total = 0L
    val t = new Thread(() => {
      var passes = 0L; var s = 0L
      while (!stop.get()) {
        var j = 0
        while (j < words) { s += a(j); j += 1 }
        passes += 1
      }
      total = if (s == 42) -1 else passes * words.toLong
    })
    t.start(); Thread.sleep(ms); stop.set(true); t.join()
    total * 8.0 / (ms / 1000.0)
  }
}

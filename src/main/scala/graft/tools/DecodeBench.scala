package graft.tools
import graft.functions.ImageCodec
import graft.synth.Synth
import java.util.concurrent.atomic.AtomicLong
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val grid = graft.Bench.benchGrid
    val pngs = (0 until 64).map(i =>
      ImageCodec.encodePng(Synth.tilePixels(grid, i / 8, i % 8), grid.tileW, grid.tileH)).toArray
    def run(threads: Int, perThread: Int): Double = {
      val t0 = System.nanoTime()
      val sink = new AtomicLong()
      val ts = (0 until threads).map { t => new Thread(() => {
        var i = 0; var acc = 0L
        while (i < perThread) {
          val px = ImageCodec.decodePng(pngs((t * 31 + i) % pngs.length))
          acc += px(i % px.length).toLong
          i += 1
        }
        sink.addAndGet(acc)
      })}
      ts.foreach(_.start()); ts.foreach(_.join())
      val dt = (System.nanoTime() - t0) / 1e9
      threads * perThread / dt
    }
    run(4, 400) // warmup
    for (t <- Seq(1, 8, 32)) {
      val thr = run(t, 1500)
      println(f"[dec] threads=$t%2d decode=${thr}%9.0f tiles/s (per-thread ${thr/t}%8.0f)")
    }
  }
}

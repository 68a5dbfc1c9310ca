package graft.tools

import graft.functions.ImageCodec
import graft.synth.Synth

/** Decode-cost decomposition probe (optimization round): splits the
  * PNG tile decode into its three phases — zlib inflate, PNG
  * unfilter, sample conversion — to show which one the per-tile
  * budget actually goes to. Synthesizes the same tiles the bench
  * table holds (Synth variants), so the filtered-stream shape matches
  * the measured workload. Dev tool, not part of the driver contract.
  */
object DecodeProf {
  def main(args: Array[String]): Unit = {
    val grid = graft.Bench.benchGrid
    val n = 64
    val pngs = (0 until n).map(i =>
      ImageCodec.encodePng(Synth.tilePixels(grid, i / 8, i % 8),
        grid.tileW, grid.tileH)).toArray
    println(s"[decprof] avg png bytes = ${pngs.map(_.length).sum / n}")

    // filter-byte census of the filtered stream
    val inf = new java.util.zip.Inflater()
    val rowBytes = grid.tileW * 2
    val need = (rowBytes + 1) * grid.tileH
    val raw = new Array[Byte](need)
    def inflateTo(png: Array[Byte], dst: Array[Byte]): Int = {
      inf.reset()
      var off = 0
      var p = 8
      while (p + 8 <= png.length && off < dst.length) {
        val len = ((png(p) & 0xff) << 24) | ((png(p + 1) & 0xff) << 16) |
          ((png(p + 2) & 0xff) << 8) | (png(p + 3) & 0xff)
        val typ = new String(png, p + 4, 4, "US-ASCII")
        if (typ == "IDAT") {
          inf.setInput(png, p + 8, len)
          var more = true
          while (more && off < dst.length && !inf.finished()) {
            val k = inf.inflate(dst, off, dst.length - off)
            off += k
            if (k == 0 && inf.needsInput()) more = false
          }
        }
        p += 12 + len
      }
      off
    }
    val filterCounts = new Array[Long](5)
    pngs.foreach { png =>
      require(inflateTo(png, raw) == need)
      var r = 0
      while (r < grid.tileH) {
        filterCounts(raw(r * (rowBytes + 1)) & 0xff) += 1
        r += 1
      }
    }
    println(s"[decprof] filter-type rows: " +
      filterCounts.zipWithIndex.map { case (c, t) => s"$t:$c" }
        .mkString(" "))

    def time(tag: String, reps: Int)(body: Int => Unit): Double = {
      // warmup
      (0 until math.max(50, reps / 10)).foreach(body)
      val t0 = System.nanoTime()
      (0 until reps).foreach(body)
      val perOp = (System.nanoTime() - t0) / 1e3 / reps
      println(f"[decprof] $tag%-22s ${perOp}%9.1f us/tile")
      perOp
    }

    val reps = 3000
    time("inflate only", reps) { i => inflateTo(pngs(i % n), raw) }
    time("full decodePng", reps) { i =>
      val px = ImageCodec.decodePng(pngs(i % n)); if (px(0) == 1e30f) ??? }
    time("decodeTL png", reps) { i =>
      val px = ImageCodec.decodeTL(pngs(i % n), "png")
      if (px(0) == 1e30f) ??? }
    // raw format reference: the no-decode floor
    val raws = (0 until n).map(i =>
      ImageCodec.encodeRaw(Synth.tilePixels(grid, i / 8, i % 8))).toArray
    time("raw decode", reps) { i =>
      val px = ImageCodec.decodeRaw(raws(i % n)); if (px(0) == 1e30f) ??? }
    time("decodeTL raw", reps) { i =>
      val px = ImageCodec.decodeTL(raws(i % n), "raw")
      if (px(0) == 1e30f) ??? }

    // full per-tile kernel (decode + scanline + accumulate) against
    // the bench zone mix — the single-thread per-tile CPU budget the
    // p32 stage multiplies by 10⁶/32
    val zones = graft.Bench.benchZones(grid)
    val idx = new graft.geom.ZoneIndex(zones.map(z => z.copy(geom =
      graft.geom.Zone.simplifyHalfPixel(z.geom, grid.gt.px))).toArray)
    val ids = (0 until n).map(i =>
      graft.operators.ZonalStats.tileId(i / 8, i % 8)).toArray
    var acc = 0L
    var nparts = 0L
    (0 until n).foreach { i =>
      val it = graft.operators.ZonalStats.processTile(ids(i), pngs(i),
        "png", grid, idx, Some(-9999.0), collectValues = false)
      while (it.hasNext) { acc += it.next().cnt; nparts += 1 }
    }
    println(s"[decprof] kernel visits/tile = ${acc / n} " +
      s"partials/tile = ${nparts.toDouble / n}")
    time("kernel png (whole)", reps) { i =>
      val it = graft.operators.ZonalStats.processTile(ids(i % n),
        pngs(i % n), "png", grid, idx, Some(-9999.0),
        collectValues = false)
      while (it.hasNext) acc += it.next().cnt
    }
    if (acc == -1) ???
  }
}

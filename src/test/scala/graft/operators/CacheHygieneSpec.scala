package graft.operators

import graft.SparkSpec
import graft.engine.{Caches, Fixtures}
import graft.synth.Synth

/** Block-manager hygiene: a long-lived session running the engine in
  * a loop (a bench harness, a service) must not accumulate persisted
  * RDDs or broadcasts while waiting for the ContextCleaner — each
  * pipeline run releases its own caches once the dimension-sized
  * result has materialized. */
class CacheHygieneSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {
  private val grid = Synth.testGrid

  // the shared test session may carry registered caches from an
  // earlier suite (exactly what a harness drains between queries) —
  // start each hygiene assertion from a clean slate
  override def beforeEach(): Unit = {
    super.beforeEach()
    Caches.drain(spark)
  }

  test("zonal pipeline leaves no persisted RDDs behind, run in a loop") {
    val tiles = Synth.tiles(spark, grid, "png")
    for (i <- 1 to 3) {
      // percentile run: exercises BOTH persist sites (partials + fid
      // stats) and the fallback pass's cached window partials
      val res = ZonalEngine.run(spark, tiles,
        Fixtures.zonesBasic(grid) ++ Fixtures.zonesFallback(grid), grid,
        Some(-9999.0), Seq(25.0, 75.0))
      assert(res.count() > 0)
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"iteration $i leaked persisted RDDs: " +
          spark.sparkContext.getPersistentRDDs.values.map(_.name))
    }
  }

  test("checkpointed path leaves no persisted RDDs behind") {
    val root = java.nio.file.Files
      .createTempDirectory("hygiene-table").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("hygiene-ckpt").toString
    graft.sources.TileTable.write(spark, Synth.tiles(spark, grid, "png"),
      grid, Some(-9999.0), root, cellLevel = 4, numFiles = 4)
    val table = graft.sources.TileTable.open(root)
    val res = graft.engine.Checkpoints.resumableZonalStats(spark, table,
      Fixtures.zonesBasic(grid), ckpt, runId = "hyg",
      keepCheckpoints = false)
    assert(res.count() > 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("minhash cache is registered and drained") {
    import spark.implicits._
    val docs = (1 to 40).map(i =>
      (s"d$i", s"alpha beta gamma delta tok$i tok${i % 7}"))
      .toDF("doc_id", "text")
    val before = Caches.pending(spark)
    val res = TextOps.minhashDedup(docs, "doc_id", "text",
      numHashes = 8, numBands = 4, minJaccard = 0.5)
    res.count()
    // three registered caches: the content-group collapse + the
    // minhash signature frame + the verify token-set frame
    assert(Caches.pending(spark) == before + 3)
    Caches.drain(spark)
    assert(Caches.pending(spark) == 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}

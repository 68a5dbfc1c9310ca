package graft.operators

import graft.SparkSpec

/** Connected-components label propagation: fixpoint correctness on
  * adversarial graph shapes, vs a simple union-find reference. */
class DedupSpec extends SparkSpec {

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)])
      : Map[Long, Long] = {
    import spark.implicits._
    val got = Dedup.connectedComponents(
      nodes.toDF("id"), edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.engine.Caches.drain(spark)
    got
  }

  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)])
      : Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonicalize to the component's min id
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }
  }

  test("chain, cycle, clique, isolated — matches union-find") {
    val nodes = (1L to 20L)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // chain (diameter test)
      (6L, 7L), (7L, 8L), (8L, 6L), // cycle
      (10L, 11L), (10L, 12L), (11L, 12L), (12L, 13L), // clique + tail
      (15L, 19L)) // edge given "backwards" in magnitude
    val got = run(nodes, edges)
    assert(got === unionFind(nodes, edges))
    assert(got(5L) === 1L) // chain fully propagated
    assert(got(16L) === 16L) // isolated node is its own component
  }

  test("dedupClusters flags exactly the component minima as canonical") {
    import spark.implicits._
    val res = Dedup.dedupClusters(
      (1L to 6L).toDF("id"),
      Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    graft.engine.Caches.drain(spark)
    assert(res.toSet === Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false)))
  }

  test("propagation leaves no persisted RDDs after drain") {
    run((1L to 30L), (1L until 30L).map(i => (i, i + 1)))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}

package graft.operators

import graft.SparkSpec

/** Connected-components label propagation: fixpoint correctness on
  * adversarial graph shapes, vs a simple union-find reference. */
class DedupSpec extends SparkSpec {

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
      smallGraphThreshold: Long = Dedup.SmallGraphThreshold)
      : Map[Long, Long] = {
    import spark.implicits._
    val got = Dedup.connectedComponents(
      nodes.toDF("id"), edges.toDF("id_a", "id_b"),
      smallGraphThreshold = smallGraphThreshold)
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

  test("chain, cycle, clique, isolated — matches union-find, BOTH paths") {
    val nodes = (1L to 20L)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // chain (diameter test)
      (6L, 7L), (7L, 8L), (8L, 6L), // cycle
      (10L, 11L), (10L, 12L), (11L, 12L), (12L, 13L), // clique + tail
      (15L, 19L)) // edge given "backwards" in magnitude
    val want = unionFind(nodes, edges)
    val fast = run(nodes, edges) // small graph → driver union-find
    assert(fast === want)
    assert(fast(5L) === 1L) // chain fully propagated
    assert(fast(16L) === 16L) // isolated node is its own component
    // threshold 0 forces the distributed loop — the 100 TB path
    assert(run(nodes, edges, smallGraphThreshold = 0L) === want)
  }

  test("fast path ≡ distributed loop on a random graph") {
    val rnd = new scala.util.Random(4242)
    val nodes = (0L until 200L)
    val edges = Seq.fill(150)(
      (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    assert(run(nodes, edges) === unionFind(nodes, edges))
    assert(run(nodes, edges, smallGraphThreshold = 0L) ===
      unionFind(nodes, edges))
  }

  test("edges touching unknown vertices do not propagate (both paths)") {
    // 1—99 and 99—2, but 99 is NOT a node: 1 and 2 stay separate,
    // matching the distributed loop where 99 has no label row
    val nodes = Seq(1L, 2L, 3L)
    val edges = Seq((1L, 99L), (99L, 2L), (2L, 3L))
    for (thr <- Seq(Dedup.SmallGraphThreshold, 0L)) {
      val got = run(nodes, edges, smallGraphThreshold = thr)
      assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
    }
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

  test("null-id node rows pass through identically on both paths") {
    import spark.implicits._
    val nodes = Seq[Option[Long]](Some(1L), Some(2L), Some(3L), None)
      .toDF("id")
    val edges = Seq((1L, 2L)).toDF("id_a", "id_b")
    for (thr <- Seq(Dedup.SmallGraphThreshold, 0L)) {
      val got = Dedup.connectedComponents(nodes, edges,
        smallGraphThreshold = thr)
        .collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
      graft.engine.Caches.drain(spark)
      assert(got === Set(
        (Some(1L), Some(1L)), (Some(2L), Some(1L)),
        (Some(3L), Some(3L)), (None, None)), s"thr=$thr")
    }
  }

  test("non-long edge ids fall back to the distributed loop") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1, 2)).toDF("id_a", "id_b") // IntegerType
    val got = Dedup.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.engine.Caches.drain(spark)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("propagation leaves no persisted RDDs after drain (both paths)") {
    run((1L to 30L), (1L until 30L).map(i => (i, i + 1)))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    run((1L to 30L), (1L until 30L).map(i => (i, i + 1)),
      smallGraphThreshold = 0L)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Clustering layer of the dedup pipeline: near-dup PAIRS (from
  * MinHash-LSH, winnowing, SRP — any pair producer) are only half the
  * job; production dedup keeps ONE canonical document per connected
  * component of the similarity graph. This computes components with
  * iterative hash-min label propagation:
  *
  *   label(v) ← min(label(v), min over neighbors' labels)
  *
  * combined with POINTER JUMPING (path compression):
  *
  *   label(v) ← label(label(v))
  *
  * repeated to fixpoint — every vertex ends with the minimum vertex
  * id reachable from it, a deterministic canonical id. Neighbor
  * propagation alone needs diameter-many rounds (a pathological
  * chain = O(n)); the jumping step halves label-tree depth each round,
  * so convergence is O(log n) rounds even on chains — each round is
  * two equi-joins + an aggregation, all shuffling on vertex id.
  *
  * The driver loop materializes each round (the convergence check
  * needs a count anyway) and releases the previous round's cache
  * immediately — bounded block-manager state however many rounds run.
  */
object Dedup {

  /** Component id (minimum reachable vertex id) for every vertex in
    * `nodes`, including isolated ones.
    *
    * @param nodes one column `id`
    * @param edges columns `id_a`, `id_b` (undirected, any direction)
    * @param maxIter hard cap on propagation rounds; with pointer
    *   jumping convergence needs ~log₂(longest path) rounds, so the
    *   default covers any graph that fits in a cluster. Exceeding it
    *   THROWS — partially-propagated labels would silently split
    *   components and let duplicates survive dedup. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 64): DataFrame = {
    val spark = nodes.sparkSession

    // ITERATIVE-DATAFRAME TRAP: building round N's frame on round
    // N-1's keeps growing one logical plan, and Catalyst re-analyzes
    // the whole chain every round — planning time explodes after a
    // few dozen iterations. Each round therefore re-roots its result
    // as a LogicalRDD over the persisted output (constant-size plan;
    // the persisted blocks bound RDD recompute).
    def reroot(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)

    // consumed once per round: cache the (possibly expensive) edge
    // producer's output — and RE-ROOT it, or every round's two joins
    // drag the producer's whole logical plan (an LSH pipeline can be
    // dozens of operators deep) back through analysis/optimization:
    // measured 6.7 s/round planning vs ~0.3 s with the LogicalRDD root
    val adj0 = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist()
    adj0.count()
    graft.engine.Caches.register(spark,
      () => { adj0.unpersist(false); () })
    val adj = reroot(adj0)

    val labels0 = nodes.select(col("id"), col("id").as("comp"))
      .persist()
    var labels = labels0
    var iter = 0
    var converged = false
    // on ANY failure — including the initial materializations — release
    // whatever this loop pinned: a failed job must not strand round
    // caches in the block manager
    try {
    labels0.count()
    labels = reroot(labels0).persist()
    labels.count()
    labels0.unpersist(false)
    while (!converged && iter < maxIter) {
      // 1. hash-min over neighbors
      val nbr = adj
        .join(labels.select(col("id").as("src"), col("comp")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min("comp").as("nbr_comp"))
      val stepped = labels.join(nbr, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp")))
            .as("comp"))
      // 2. pointer jumping: follow one hop in the label forest
      // (label(v) ← label(label(v)) — label values are vertex ids, so
      // the lookup is a self-join; comp(x) ≤ x keeps this monotone)
      val lookup = stepped.select(col("id").as("cid"),
        col("comp").as("jump"))
      val next0 = stepped
        .join(lookup, stepped("comp") === lookup("cid"), "left_outer")
        .select(stepped("id"),
          least(stepped("comp"), coalesce(col("jump"), stepped("comp")))
            .as("comp"))
        .persist()
      val changed = next0
        .join(labels.withColumnRenamed("comp", "prev"), Seq("id"))
        .where(col("comp") =!= col("prev"))
        .count() // materializes `next0`, so the old cache can go
      labels.unpersist(false)
      labels = reroot(next0).persist()
      // hand the re-rooted frame its own cache and let the round's
      // working cache go once the next count materializes it
      labels.count()
      next0.unpersist(false)
      converged = changed == 0
      iter += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"CC round $iter changed=$changed " +
          s"t=${System.nanoTime() / 1000000}")
    }
    } catch {
      case e: Throwable =>
        try labels.unpersist(false)
        catch { case scala.util.control.NonFatal(_) => () }
        try labels0.unpersist(false) // no-op once released in-line
        catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
    if (!converged) {
      labels.unpersist(false)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "partially-propagated labels would silently split components")
    }
    // the result stays distributed (node-cardinality — unbounded at
    // the caller's scale choice); its cache is dropped via the
    // session registry once the caller has consumed it
    graft.engine.Caches.register(spark, {
      val last = labels
      () => { last.unpersist(false); () }
    })
    labels
  }

  /** Dedup clustering summary: component id per document plus the
    * canonical flag (the component's minimum id survives; the rest
    * are the removable duplicates). */
  def dedupClusters(nodes: DataFrame, pairs: DataFrame,
      maxIter: Int = 50): DataFrame =
    connectedComponents(nodes, pairs, maxIter)
      .withColumn("is_canonical", (col("id") === col("comp")))
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def mkVecs(n: Int, dim: Int) = {
    // deterministic pseudo-random unit-ish vectors + planted near-dups
    val rows = (0 until n).map { i =>
      val base = Array.tabulate(dim)(d =>
        (((i * 131 + d * 37) % 97) / 48.5 - 1.0).toFloat)
      Row(i.toLong, base)
    } ++ (0 until 5).map { i => // planted: id 1000+i ≈ id i (tiny noise)
      val base = Array.tabulate(dim)(d =>
        (((i * 131 + d * 37) % 97) / 48.5 - 1.0).toFloat)
      base(0) = base(0) + 0.01f
      Row(1000L + i, base)
    }
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 4), schema)
  }

  test("SRP bucketed near-dup finds the planted pairs brute force finds") {
    val df = mkVecs(60, 16)
    val brute = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      0.999).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val srp = Similarity.srpNearDupPairs(df, "vec_id", "embedding",
      dim = 16, numPlanes = 8, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted pairs must be present in both (identical direction ⇒
    // identical SRP bucket, so LSH recall is 1.0 for them)
    for (i <- 0 until 5) {
      assert(brute.contains((i.toLong, 1000L + i)))
      assert(srp.contains((i.toLong, 1000L + i)))
    }
    // srp results are a subset of brute-force results (no false pairs)
    assert(srp.subsetOf(brute))
  }

  test("incremental SRP dedup equals the full recompute filtered to " +
      "batch-touching pairs") {
    import org.apache.spark.sql.functions.col
    val df = mkVecs(60, 16)
    val corpus = df.where(col("vec_id") % 5 =!= 4)
    val batch = df.where(col("vec_id") % 5 === 4)
    def pairs(res: org.apache.spark.sql.DataFrame) =
      res.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = Similarity.srpIndex(corpus, "vec_id", "embedding",
      dim = 16, numPlanes = 8)
    val inc = pairs(Similarity.srpNearDupIncremental(idx, batch,
      "vec_id", "embedding", threshold = 0.95))
    val full = pairs(Similarity.srpNearDupPairs(df, "vec_id",
      "embedding", dim = 16, numPlanes = 8, threshold = 0.95))
    val expected = full.filter(p => p._1 % 5 == 4 || p._2 % 5 == 4)
    assert(inc == expected, s"inc=$inc\nexpected=$expected")
    assert(inc.nonEmpty, "fixture must exercise the batch side")
    assert(full.exists(p => p._1 % 5 != 4 && p._2 % 5 != 4),
      "fixture must contain corpus-internal pairs the incremental " +
        "result correctly omits")
  }

  test("multi-probe SRP: recall >= 0.9 of exact pairs, beats single-probe") {
    val df = mkVecs(200, 16)
    val threshold = 0.95
    def pairs(res: org.apache.spark.sql.DataFrame) =
      res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineNearDupPairs(df, "vec_id",
      "embedding", threshold))
    val single = pairs(Similarity.srpNearDupPairs(df, "vec_id",
      "embedding", dim = 16, numPlanes = 8, threshold = threshold))
    val multi = pairs(Similarity.srpNearDupPairsMultiProbe(df, "vec_id",
      "embedding", dim = 16, numPlanes = 8, threshold = threshold))
    val banded = pairs(Similarity.srpBandedNearDupPairs(df, "vec_id",
      "embedding", dim = 16, numPlanes = 16, numBands = 4,
      threshold = threshold))
    assert(exact.nonEmpty)
    // no false positives in any (every emitted pair is score-checked)
    assert(single.subsetOf(exact))
    assert(multi.subsetOf(exact))
    assert(banded.subsetOf(exact))
    // Hamming-1 probing dominates the single bucket
    assert(single.subsetOf(multi))
    val recallS = single.size.toDouble / exact.size
    val recallM = multi.size.toDouble / exact.size
    val recallB = banded.size.toDouble / exact.size
    assert(recallM >= recallS,
      s"multi-probe recall $recallM < single-probe $recallS")
    // the OR-amplified band join is the >= 0.9-recall configuration
    assert(recallB >= 0.9, s"banded recall $recallB < 0.9")
  }

  test("IVF top-k: subset of brute-force candidates, high recall@k") {
    val df = mkVecs(120, 16)
    val cents = df.where(col("vec_id") < 6)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val queries = df.where(col("vec_id") >= 50 && col("vec_id") < 60)
    def topk(res: org.apache.spark.sql.DataFrame) =
      res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topk(Similarity.cosineTopK(df, queries, "vec_id",
      "embedding", k = 3))
    val ivf = topk(Similarity.ivfTopK(df, queries, cents, "vec_id",
      "embedding", "cent_id", "cvec", k = 3, nProbe = 3))
    assert(ivf.nonEmpty)
    // every query answered with k results
    assert(ivf.groupBy(_._1).forall(_._2.size == 3))
    // probing half the lists recovers most of the exact top-k
    val recall = (ivf intersect exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"IVF recall@3 $recall < 0.7")
  }

  /** Clustered data (8 well-separated direction clusters + jitter):
    * the shape IVF is built for. */
  private def mkClustered(perCluster: Int, dim: Int) = {
    val rows = for (c <- 0 until 8; j <- 0 until perCluster) yield {
      val v = Array.tabulate(dim) { d =>
        val center = if (d % 8 == c) 4.0 else 0.2 * (((c * 31 + d * 7) % 11) - 5)
        (center + 0.05 * (((c * 131 + j * 37 + d * 13) % 19) - 9)).toFloat
      }
      Row((c * perCluster + j).toLong, v)
    }
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 4), schema)
  }

  test("k-means trainer: deterministic, and trained IVF recall@k >= 0.9") {
    val df = mkClustered(perCluster = 40, dim = 16)
    val c1 = KMeans.trainFromDataFrame(df, "vec_id", "embedding",
      k = 8, iters = 10, sampleSize = 160)
    val c2 = KMeans.trainFromDataFrame(df, "vec_id", "embedding",
      k = 8, iters = 10, sampleSize = 160)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq,
      "training is not deterministic")

    val queries = df.where(col("vec_id") % 20 === 3)
    def topk(res: org.apache.spark.sql.DataFrame) =
      res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topk(Similarity.cosineTopK(df, queries, "vec_id",
      "embedding", k = 5))
    val ivf = topk(Similarity.ivfTopK(df, queries,
      KMeans.centroidsDf(spark, c1), "vec_id", "embedding",
      "cent_id", "cvec", k = 5, nProbe = 2))
    val recall = (ivf intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"trained-IVF recall@5 $recall < 0.9")
  }

  test("cosine of identical vectors is 1.0") {
    val df = mkVecs(3, 8)
    val self = df.select(
      Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    self.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }
}

class SamplingSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def docs = {
    import spark.implicits._
    (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
  }

  test("hashSplit partitions every row into exactly one split, stably") {
    val s1 = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 8, "val" -> 1, "test" -> 1))
    val byId = s1.select("doc_id", "split_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.size === 500) // every row assigned exactly once
    val sizes = byId.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.keySet === Set("train", "val", "test"))
    // ~80/10/10 within loose bounds (hash-uniform, not RNG)
    assert(sizes("train") > 350 && sizes("train") < 450, sizes)
    // stability: a second evaluation assigns identically
    val byId2 = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 8, "val" -> 1, "test" -> 1))
      .select("doc_id", "split_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId === byId2)
  }

  test("null keys fail loudly in both split and sample") {
    import spark.implicits._
    val withNull = Seq(Some(1L), None, Some(3L)).toDF("doc_id")
    val ex1 = intercept[Exception] {
      Sampling.hashSplit(withNull, "doc_id", Seq("a" -> 1, "b" -> 1))
        .collect()
    }
    assert(ex1.getMessage.contains("NULL key") ||
      Option(ex1.getCause).exists(_.getMessage.contains("NULL key")))
    val ex2 = intercept[Exception] {
      Sampling.sampleByHash(withNull, "doc_id", 1, 2).collect()
    }
    assert(ex2.getMessage.contains("NULL key") ||
      Option(ex2.getCause).exists(_.getMessage.contains("NULL key")))
  }

  test("sampleByHash: exact subset semantics and degenerate fractions") {
    val all = docs
    val kept = Sampling.sampleByHash(all, "doc_id", 1, 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept.size < 500)
    // the kept set is exactly the bucket-0 rows of the same hash
    val buckets = all.select(col("doc_id"),
      Sampling.hashBucket(col("doc_id"), 4).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept === buckets.filter(_._2 == 0L).keySet)
    assert(Sampling.sampleByHash(all, "doc_id", 4, 4).count() === 500)
    assert(Sampling.sampleByHash(all, "doc_id", 0, 4).count() === 0)
  }
}

class MultimodalStubsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("pcm16 frame sampling is deterministic and counts frames") {
    val bytes = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val (n, frames, sum) = MultimodalStubs.frameSample(bytes, stride = 4)
    assert(n === 32) // 64 bytes = 32 samples
    assert(frames === 8)
    assert((n, frames, sum) === MultimodalStubs.frameSample(bytes.clone(), 4))
  }

  test("video: PNG-signature split recovers every frame, decode matches") {
    val k = 3L
    val stream = graft.synth.Synth.videoPngStream(k, nFrames = 7,
      w = 8, h = 8)
    val frames = Video.splitPngFrames(stream)
    assert(frames.length === 7)
    // concatenation is lossless: frames re-concatenate to the stream
    assert(frames.toArray.flatten.sameElements(stream))
    // each recovered frame decodes to the generator's pixel field
    for (j <- frames.indices) {
      val px = graft.functions.ImageCodec.decode(frames(j), "png")
      assert(px.length === 64)
      for (r <- 0 until 8; c <- 0 until 8) {
        assert(px(r * 8 + c) ===
          ((k * 31 + j * 17 + r * 7 + c * 3) % 251).toFloat, s"j=$j r=$r c=$c")
      }
    }
    // degenerate inputs
    assert(Video.splitPngFrames(Array.empty[Byte]).isEmpty)
    assert(Video.splitPngFrames("not a png".getBytes).isEmpty)
    // garbage prefix: frames still found from the first signature
    val prefixed = "junk".getBytes ++ stream
    assert(Video.splitPngFrames(prefixed).length === 7)
  }

  test("video frame sampling: every stride-th frame, stats correct") {
    val stats = Video.frameSampleStats(
      graft.synth.Synth.videoPngStream(5L, nFrames = 12), stride = 3)
    assert(stats.map(_._1) === Seq(0, 3, 6, 9))
    assert(stats.forall(_._2 == 64L))
    val expSum = (for (r <- 0 until 8; c <- 0 until 8)
      yield ((5L * 31 + 3 * 17 + r * 7 + c * 3) % 251).toDouble).sum
    assert(stats.find(_._1 == 3).get._3 === expSum)
  }
}

class OverlapKnnSpec extends SparkSpec {
  test("overlap areas equal JTS driver-side computation") {
    import spark.implicits._
    val grid = graft.synth.Synth.testGrid
    val a = graft.engine.Fixtures.zonesBasic(grid).filter(_.fid <= 5)
    val b = a.map(z => {
      val g = new org.locationtech.jts.geom.util.AffineTransformation()
        .translate(5.0, 3.0).transform(z.geom)
      graft.geom.Zone(z.fid + 100, z.group, g)
    })
    val aDf = a.map(z => (z.fid, graft.geom.Zone.toWkb(z.geom)))
      .toDF("fid", "geom_wkb")
    val bc = spark.sparkContext.broadcast(
      new graft.geom.ZoneIndex(b.toArray))
    val got = OverlapKnn.overlapPairs(spark, aDf, bc)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    // brute-force all pairs driver-side
    for (za <- a; zb <- b) {
      val inter = za.geom.intersection(zb.geom).getArea
      if (inter > 0)
        assert(got((za.fid, zb.fid)) === inter, s"(${za.fid},${zb.fid})")
      else assert(!got.contains((za.fid, zb.fid)))
    }
  }
}

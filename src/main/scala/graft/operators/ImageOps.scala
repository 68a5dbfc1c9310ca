package graft.operators

import graft.functions.{functions => gf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Multimodal column operators: images are REAL (decode via the
  * ImageDecode Catalyst expression, resize/stats as codegen'd
  * higher-order functions over the pixel array); audio/video are
  * opaque binary with typed metadata. Real codecs in this repo:
  * PCM16 + IMA ADPCM audio and the inter-frame delta video codec
  * ([[graft.functions.AdpcmCodec]]/[[graft.functions.DeltaVideoCodec]]),
  * plus the PNG-container frame split below; industry formats whose
  * decoders need native media libraries (MP3/AAC, H.26x) remain out
  * of scope in this container — the Spark-side plumbing, schemas and
  * batch shapes they'd plug into are the ones tested here.
  */
object ImageOps {

  /** Decoded pixel array (float32) of a tile row. */
  def pixels(bytes: Column, fmt: Column): Column = gf.image_decode(bytes, fmt)

  /** Σ over the pixel array in double, sequential fold. */
  def pxSum(px: Column): Column =
    aggregate(px, lit(0.0), (acc, v) => acc + v.cast("double"))

  def pxMin(px: Column): Column = array_min(px).cast("double")
  def pxMax(px: Column): Column = array_max(px).cast("double")

  def pxCountEq(px: Column, value: Column): Column =
    size(filter(px, v => v === value)).cast("long")

  /** Nearest-neighbor downsample by integer `factor` (top-left pick):
    * out(r,c) = in(r*factor, c*factor). Pure array expression —
    * no UDF, stays in codegen. */
  def resizeNearest(px: Column, w: Int, h: Int, factor: Int): Column = {
    val ow = w / factor
    val oh = h / factor
    transform(sequence(lit(0), lit(ow * oh - 1)), i => {
      // Column `/` is double division — use floor for the row index
      val r = floor(i / lit(ow)).cast("int") * factor
      val c = (i % ow) * factor
      element_at(px, (r * w + c + 1).cast("int"))
    })
  }

  /** Difference hash (dHash) of a tile — the perceptual-hash image
    * dedup primitive: downsample (nearest-neighbor) to
    * (w/factor)×(h/factor), then one bit per horizontal neighbor pair
    * (`1` iff left < right), packed MSB-first in row-major scan
    * order. Robust to brightness/contrast shifts (only ORDER of
    * neighbors matters), cheap, and a pure column expression — the
    * whole hash is one fold inside the row, codegen-friendly, no
    * shuffle. At 8×8 it is the classic 56-bit dHash. */
  def dHash(px: Column, w: Int, h: Int, factor: Int): Column = {
    val ow = w / factor
    val oh = h / factor
    require(ow >= 2 && oh >= 1, s"downsampled grid too small: ${ow}x$oh")
    require(oh * (ow - 1) <= 63, "dhash must fit a long")
    val small = resizeNearest(px, w, h, factor)
    val nbits = oh * (ow - 1)
    aggregate(sequence(lit(0), lit(nbits - 1)), lit(0L), (acc, i) => {
      val r = floor(i / lit(ow - 1)).cast("int")
      val c = (i % (ow - 1)).cast("int")
      val left = element_at(small, r * ow + c + 1)
      val right = element_at(small, r * ow + c + 2)
      acc * 2 + when(left < right, lit(1L)).otherwise(lit(0L))
    })
  }

  /** The per-value LSH band keys (band index + that band's bits) —
    * the ONE definition shared by the batch pairs path and the
    * incremental index. */
  private def dhashBandKeys(bands: Int, bitsPerBand: Int): Column = {
    val mask = (1L << bitsPerBand) - 1
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("dh"), b * bitsPerBand).bitwiseAND(lit(mask))
          .as("bits"))
    }: _*)
  }

  private def requirePigeonhole(bands: Int, bitsPerBand: Int,
      maxHamming: Int): Unit = {
    require(bands >= 1 && bitsPerBand >= 1)
    // pigeonhole: maxHamming differing bits can touch at most
    // maxHamming bands, so some band matches exactly ONLY when
    // maxHamming <= bands - 1 — past that the join silently loses
    // recall, so refuse instead
    require(maxHamming <= bands - 1,
      s"maxHamming=$maxHamming needs >= ${maxHamming + 1} bands for " +
        s"the pigeonhole recall guarantee, got $bands")
  }

  /** Image near-duplicate pairs by dHash Hamming distance ≤
    * `maxHamming`, found through an LSH band join (the SRP-banded
    * pattern applied to perceptual bits): the hash splits into
    * `bands` disjoint bit bands and a pair is a candidate iff ANY
    * band matches exactly — by pigeonhole every pair within
    * Hamming ≤ bands−1 is guaranteed caught, and candidates shuffle
    * on the band key, never the all-pairs space. Exact `bit_count`
    * filter afterwards. */
  def dhashNearDupPairs(df: DataFrame, idCol: String, dhCol: String,
      bands: Int, bitsPerBand: Int, maxHamming: Int,
      maxBandFreq: Int = Int.MaxValue): DataFrame = {
    requirePigeonhole(bands, bitsPerBand, maxHamming)
    val bandKeysArr = dhashBandKeys(bands, bitsPerBand)
    // HOT-BUCKET GUARD: blank/solid-color frames — the dominant
    // duplicate class in web image corpora — give m tiles ONE dhash
    // value and would meet as m² candidate rows inside each band
    // bucket. Collapse to DISTINCT hash values first (Hamming distance
    // depends only on the values), band-join the values, and re-expand
    // member pairs afterwards; the expansion is output-sized, which is
    // inherent to the all-pairs API. An optional per-bucket frequency
    // cap (`maxBandFreq`, over distinct VALUES) guards the residual
    // adversarial case; dropping a bucket is reported loudly because
    // it is a recall decision.
    val members = df.select(col(idCol).as("id"), col(dhCol).as("dh"))
    val vals = members.select(col("dh")).distinct()
    val banded0 = vals.select(col("dh"), explode(bandKeysArr).as("key"))
    val banded = Lsh.capBandBuckets(banded0, "key", maxBandFreq, "dhash")
    val a = banded.select(col("key"), col("dh").as("dh_a"))
    val b = banded.select(col("key"), col("dh").as("dh_b"))
    // near-dup pairs among distinct VALUES (deduped across bands)
    val valPairs = a.join(b, Seq("key"))
      .where(col("dh_a") < col("dh_b"))
      .select("dh_a", "dh_b").distinct()
      .withColumn("hamming",
        bit_count(col("dh_a").bitwiseXOR(col("dh_b"))).cast("int"))
      .where(col("hamming") <= maxHamming)
    // cross-value expansion (each member pair appears exactly once:
    // value pairs are distinct and the groups are disjoint, so no
    // output-level distinct is needed)
    val cross = valPairs
      .join(members.select(col("dh").as("dh_a"), col("id").as("ma")),
        Seq("dh_a"))
      .join(members.select(col("dh").as("dh_b"), col("id").as("mb")),
        Seq("dh_b"))
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("hamming"))
    // intra-value pairs: identical hashes, Hamming exactly 0
    val intra = members.select(col("dh"), col("id").as("id_a"))
      .join(members.select(col("dh"), col("id").as("id_b")), Seq("dh"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0).cast("int").as("hamming"))
    intra.unionByName(cross)
  }

  /** Persistable dHash index of a deduped image corpus — the
    * incremental state for the IMAGE modality: id→value members plus
    * the band keys of each DISTINCT hash value (the value-level
    * collapse is the index's shape, so a corpus of 10⁶ blank frames
    * indexes as ONE banded value). Save `valueBands` bucketed by
    * `key` and `members` by `dh` for shuffle-free per-batch joins. */
  final case class DhashIndex(members: DataFrame, valueBands: DataFrame,
    bands: Int, bitsPerBand: Int) {
    /** Persist as the incremental-dedup state (the
      * [[graft.operators.TextOps.MinhashIndex.save]] convention):
      * members + banded distinct values as parquet plus a params
      * sidecar — banding parameters travel WITH the index so a later
      * batch cannot band under a different split and silently lose
      * all recall. */
    def save(dir: String): Unit = {
      members.write.mode("overwrite").parquet(s"$dir/members")
      valueBands.write.mode("overwrite").parquet(s"$dir/valueBands")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "params.json"),
        s"""{"bands":$bands,"bitsPerBand":$bitsPerBand}""")
    }
  }

  def loadDhashIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): DhashIndex =
    DhashIndex(spark.read.parquet(s"$dir/members"),
      spark.read.parquet(s"$dir/valueBands"),
      IndexParams.intOf(dir, "bands"),
      IndexParams.intOf(dir, "bitsPerBand"))

  def dhashIndex(df: DataFrame, idCol: String, dhCol: String,
      bands: Int, bitsPerBand: Int): DhashIndex = {
    val members = df.select(col(idCol).as("id"), col(dhCol).as("dh"))
    DhashIndex(members,
      members.select("dh").distinct()
        .select(col("dh"),
          explode(dhashBandKeys(bands, bitsPerBand)).as("key")),
      bands, bitsPerBand)
  }

  /** Fold a new batch into the index: members union; only values the
    * corpus has NEVER seen are banded (value-level state — re-banding
    * a known value would duplicate its (dh, key) rows). O(batch). */
  def dhashIndexAppend(index: DhashIndex, newDf: DataFrame,
      idCol: String, dhCol: String): DhashIndex = {
    val newMembers = newDf.select(col(idCol).as("id"),
      col(dhCol).as("dh"))
    val corpusVals = index.valueBands
      .where(col("key.band") === 0).select("dh")
    val freshBands = newMembers.select("dh").distinct()
      .join(corpusVals, Seq("dh"), "left_anti")
      .select(col("dh"),
        explode(dhashBandKeys(index.bands, index.bitsPerBand))
          .as("key"))
    DhashIndex(index.members.unionByName(newMembers),
      index.valueBands.unionByName(freshBands),
      index.bands, index.bitsPerBand)
  }

  /** The index after REMOVING images (takedowns): members drop by
    * anti-join; a hash VALUE leaves the band index only when its last
    * member went (the value-level state mirrors the value-level
    * collapse). Only values the takedown touched are checked —
    * O(affected), not O(corpus). Equals [[dhashIndex]] over the
    * reduced corpus (IndexRemoveSpec). Unknown ids are no-ops. */
  def dhashIndexRemove(index: DhashIndex, removeIds: DataFrame,
      idCol: String): DhashIndex = {
    val ids = removeIds.select(col(idCol).as("id")).distinct()
    val members2 = index.members.join(broadcast(ids), Seq("id"),
      "left_anti")
    val touchedVals = index.members.join(broadcast(ids), Seq("id"))
      .select("dh").distinct()
    // touched values with NO surviving member are dead
    val deadVals = broadcast(touchedVals)
      .join(members2, Seq("dh"), "left_anti")
    DhashIndex(members2,
      index.valueBands.join(broadcast(deadVals), Seq("dh"), "left_anti"),
      index.bands, index.bitsPerBand)
  }

  /** Incremental perceptual dedup: all pairs within Hamming <=
    * maxHamming involving a batch image, given the corpus
    * [[DhashIndex]] — value-identical to [[dhashNearDupPairs]] over
    * corpus ∪ batch filtered to batch-touching pairs (oracle-pinned
    * by q_image_incr). Only the batch's hash VALUES band: genuinely
    * new values join the saved index; values the batch GAINED members
    * in (a new copy of a known image must inherit that value's
    * Hamming neighborhood — the dominant ingest case) re-enter the
    * band join from the index side. Member expansion keeps only
    * batch-touching pairs, so corpus-internal pairs never re-emit. */
  def dhashNearDupIncremental(index: DhashIndex, newDf: DataFrame,
      idCol: String, dhCol: String, maxHamming: Int,
      maxBandFreq: Int = Int.MaxValue): DataFrame = {
    val bands = index.bands
    val bitsPerBand = index.bitsPerBand
    requirePigeonhole(bands, bitsPerBand, maxHamming)
    val newMembers = newDf.select(col(idCol).as("id"),
      col(dhCol).as("dh"))
    // the index's distinct values, shuffle-free: valueBands holds one
    // row per (value, band), so band 0 is exactly one row per value
    val corpusVals = index.valueBands
      .where(col("key.band") === 0).select("dh")
    val batchVals = newMembers.select("dh").distinct()
    val freshVals = batchVals.join(corpusVals, Seq("dh"), "left_anti")
    val freshBands = freshVals.select(col("dh"),
      explode(dhashBandKeys(bands, bitsPerBand)).as("key"))
    // the frequency cap must see the value universe (index + fresh)
    // so a bucket is kept or dropped consistently for both join sides
    val kept = Lsh.capBandBuckets(
      index.valueBands.unionByName(freshBands), "key", maxBandFreq,
      "dhash-incr")
    // the left side is every batch value: fresh ones (now in `kept`
    // via freshBands) plus gained ones (already banded in the index)
    val valPairs = kept.join(batchVals, Seq("dh"))
      .select(col("key"), col("dh").as("dh_l"))
      .join(kept.select(col("key"), col("dh").as("dh_r")), Seq("key"))
      .where(col("dh_l") =!= col("dh_r"))
      .select(least(col("dh_l"), col("dh_r")).as("dh_a"),
        greatest(col("dh_l"), col("dh_r")).as("dh_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("dh_a").bitwiseXOR(col("dh_b"))).cast("int"))
      .where(col("hamming") <= maxHamming)
    val allMembers = index.members.withColumn("is_new", lit(false))
      .unionByName(newMembers.withColumn("is_new", lit(true)))
    val cross = valPairs
      .join(allMembers.select(col("dh").as("dh_a"), col("id").as("ma"),
        col("is_new").as("na")), Seq("dh_a"))
      .join(allMembers.select(col("dh").as("dh_b"), col("id").as("mb"),
        col("is_new").as("nb")), Seq("dh_b"))
      .where(col("na") || col("nb"))
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("hamming"))
    // intra-value: the batch side drives (never members ⋈ members);
    // distinct folds the two orientations of batch-batch pairs
    val intra = newMembers.select(col("dh"), col("id").as("id_n"))
      .join(allMembers.select(col("dh"), col("id").as("id_m")),
        Seq("dh"))
      .where(col("id_n") =!= col("id_m"))
      .select(least(col("id_n"), col("id_m")).as("id_a"),
        greatest(col("id_n"), col("id_m")).as("id_b"),
        lit(0).cast("int").as("hamming"))
      .distinct()
    intra.unionByName(cross)
  }

  /** Per-tile decode + stats over a tile table (the library surface
    * for "decode / feature-extract" pipelines). */
  def tileStats(tiles: DataFrame, nodata: Double): DataFrame = {
    val px = pixels(col("bytes"), col("fmt"))
    val valid = filter(px, v => v =!= lit(nodata.toFloat))
    tiles.select(
      col("image_id"),
      pxCountEq(px, lit(nodata.toFloat)).as("nodata_px"),
      size(px).cast("long").as("total_px"),
      pxSum(valid).as("sum_px"),
      pxMin(valid).as("min_px"),
      pxMax(valid).as("max_px"))
  }
}

/** Uncompressed-audio decoders (PCM16) — the raw end of the audio
  * path; the compressed end is [[graft.functions.AdpcmCodec]]. These
  * also define the schema/partitioning/batch contract any external
  * codec plugs into. */
object MultimodalStubs {

  /** Audio decode: interpret bytes as PCM16 little-endian.
    * (This part is real for actual PCM16; for compressed formats a
    * codec would replace it.) */
  def pcm16Samples(bytes: Array[Byte]): Array[Short] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    val out = new Array[Short](bb.remaining())
    bb.get(out)
    out
  }

  /** Frame-sample every `stride`-th sample; returns (n_samples,
    * n_frames, checksum) — the shape a feature-extraction stage
    * consumes. */
  def frameSample(bytes: Array[Byte], stride: Int): (Long, Long, Long) = {
    require(stride > 0, s"stride must be positive, got $stride")
    val s = pcm16Samples(bytes)
    var i = 0
    var n = 0L
    var sum = 0L
    while (i < s.length) { n += 1; sum += s(i); i += stride }
    (s.length.toLong, n, sum)
  }

}

/** Video as an opaque binary column — REAL container parse for the
  * MJPEG-style "concatenated still frames" layout: the video stream
  * is a byte concatenation of PNG images (the moving-image analogue
  * of MJPEG, with PNG in place of JPEG). Frames are recovered by
  * scanning for the 8-byte PNG signature (public PNG spec §5.2) and
  * decoded by the engine's own PNG decoder — no fake checksums, no
  * fixed frame size assumptions. Inter-frame (temporal-prediction)
  * compression lives in [[graft.functions.DeltaVideoCodec]];
  * industry-standard H.26x decode stays out of scope in this
  * container (COVERAGE.md).
  */
object Video {
  /** \x89 P N G \r \n \x1a \n */
  val PngSignature: Array[Byte] = Array(0x89.toByte, 0x50, 0x4e, 0x47,
    0x0d, 0x0a, 0x1a, 0x0a)

  /** Split a concatenated-PNG stream into frames by WALKING each
    * frame's chunk structure (public PNG spec §5.3): after the 8-byte
    * signature, chunks are (len:4 BE)(type:4)(data)(crc:4) until IEND;
    * the frame ends after IEND's CRC. A stray signature byte sequence
    * INSIDE a frame's compressed IDAT payload is therefore never
    * mistaken for a boundary. Byte runs that start with a signature
    * but don't parse to IEND are skipped, not emitted as garbage
    * fragments. */
  def splitPngFrames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val sig = PngSignature
    def sigAt(i: Int): Boolean = {
      var j = 0
      while (j < sig.length && bytes(i + j) == sig(j)) j += 1
      j == sig.length
    }
    // end offset (exclusive) after the IEND chunk's CRC, or -1 when
    // the walk runs off the buffer / hits a malformed length
    def walkToIend(start: Int): Int = {
      var p = start + sig.length
      while (p + 8 <= bytes.length) {
        val len = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
          ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
        if (len < 0) return -1
        val isEnd = bytes(p + 4) == 'I' && bytes(p + 5) == 'E' &&
          bytes(p + 6) == 'N' && bytes(p + 7) == 'D'
        val next = p.toLong + 12L + len.toLong
        if (next > bytes.length) return -1
        p = next.toInt
        if (isEnd) return p
      }
      -1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 0
    while (i <= bytes.length - sig.length) {
      if (sigAt(i)) {
        val e = walkToIend(i)
        if (e > 0) { out += java.util.Arrays.copyOfRange(bytes, i, e); i = e }
        else i += 1 // malformed frame: scan forward to the next signature
      } else i += 1
    }
    out.toIndexedSeq
  }

  /** Decode every `stride`-th frame and return
    * (frame_idx, n_px, sum_px) per sampled frame — the shape a
    * feature-extraction / frame-embedding stage consumes. Frames that
    * fail to decode are skipped (never dereferenced). */
  def frameSampleStats(bytes: Array[Byte],
      stride: Int): Seq[(Int, Long, Double)] = {
    require(stride > 0, s"stride must be positive, got $stride")
    val frames = splitPngFrames(bytes)
    (0 until frames.length by stride).flatMap { f =>
      val px =
        try graft.functions.ImageCodec.decode(frames(f), "png")
        catch { case _: Exception => null }
      if (px == null) None
      else {
        var sum = 0.0
        var i = 0
        while (i < px.length) { sum += px(i); i += 1 }
        Some((f, px.length.toLong, sum))
      }
    }
  }
}

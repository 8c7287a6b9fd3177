package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.10): media as opaque `binary`
  * columns with a typed metadata struct, plus feature-extraction passes.
  *
  * Two codec tiers:
  *  - [[synthesizeImages]] / [[decodeImageFeatures]]: a REAL image
  *    round-trip — `javax.imageio` PNG encode and decode plus a
  *    nearest-neighbor resample over the decoded raster, inside the
  *    per-partition-init `mapPartitions` boundary. The synthesized pixels
  *    are deterministic functions of the asset id, so the decoded
  *    dims/luma are DuckDB-oracle-checkable end to end.
  *  - [[synthesizeAudio]] / [[decodeAudioFeatures]]: a REAL audio
  *    round-trip — RIFF/WAVE PCM16 files parsed by
  *    `javax.sound.sampled.AudioSystem`, integer signal features
  *    (amplitude, energy, zero crossings) over the decoded samples.
  *  - [[synthesizeVideos]] / [[decodeVideoFeatures]]: a REAL multi-frame
  *    round-trip — animated-GIF containers frame-walked by the GIF reader.
  *  - [[StubCodec]]: the remaining stand-in for RICHER codecs this
  *    container lacks (H.264-class video, JPEG). A production build drops
  *    a JNI/javacv decoder into [[Codec]] without touching the plan
  *    shape: the `mapPartitions` boundary is where per-batch native
  *    decoding belongs (one codec init per partition, not per row — same
  *    shape `mapInPandas` gives PySpark).
  */
object Multimodal {

  /** Fake-asset table: text bytes standing in for media payloads, with the
    * metadata struct a real pipeline would carry (FIXTURES-style). */
  def assets(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("payload"),
      struct(
        col("source").as("origin"),
        lit("fake/raw").as("mime"),
        (pmod(col("doc_id"), lit(320)) + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(240)) + 48).cast("int").as("height")).as("meta"))

  /** Declarative feature pass (no codec needed): byte length + sha-256
    * content address + metadata projection. Stays in codegen. */
  def features(documents: DataFrame): DataFrame =
    assets(documents).select(
      col("asset_id"),
      octet_length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      (col("meta.width") * col("meta.height")).as("n_pixels"))

  /** Frame sampling: model the payload as fixed-size frames and keep every
    * `stride`-th one — the video-pipeline shape (sample before decode, so
    * dropped frames never pay decode cost). Pure column ops: one row per
    * sampled frame with its index and bytes. */
  def sampleFrames(documents: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive: $frameBytes")
    require(stride > 0, s"stride must be positive: $stride")
    val a = assets(documents)
      .select(col("asset_id"), col("payload"),
        ceil(octet_length(col("payload")) / lit(frameBytes.toDouble)).cast("int")
          .as("n_frames"))
    // an EMPTY payload has zero frames — without the filter, the
    // greatest(n_frames − 1, 0) clamp would emit one phantom frame_idx=0
    // row with sha256('') for it (review r12)
    a.where(col("n_frames") > 0)
      .select(col("asset_id"), col("n_frames"),
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride)))
          .as("frame_idx"),
        col("payload"))
      .select(col("asset_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame_bytes"))
      .withColumn("frame_sha", sha2(col("frame_bytes"), 256))
  }

  /** Resize plumbing: new metadata dims plus a proportionally truncated
    * payload standing in for the resampled buffer (a real codec plugs into
    * [[decodeFeatures]]'s partition boundary; the schema contract —
    * payload + dims in, payload + dims out — is what matters here). */
  def resizeStub(documents: DataFrame, targetWidth: Int): DataFrame =
    assets(documents).select(
      col("asset_id"),
      col("meta.width").as("src_width"), col("meta.height").as("src_height"),
      lit(targetWidth).as("width"),
      (col("meta.height") * targetWidth / col("meta.width")).cast("int").as("height"),
      col("payload").substr(lit(1),
        greatest((octet_length(col("payload")) * targetWidth / col("meta.width")).cast("int"),
          lit(1))).as("payload"))

  final case class ImageRow(asset_id: Long, png: Array[Byte])
  final case class ImageFeatures(asset_id: Long, width: Long, height: Long,
      sum_luma: Long, rs_width: Long, rs_height: Long, rs_sum_luma: Long)

  final case class ResizedImage(asset_id: Long, src_width: Long,
      src_height: Long, width: Long, height: Long, sum_luma: Long,
      png: Array[Byte])

  /** REAL arbitrary-size resize — the production thumbnail/model-input
    * pass (upgrades [[resizeStub]]'s byte-slice contract to decoded-pixel
    * work): PNG decode, nearest-neighbor resample to (targetW, targetH)
    * with the standard mapping src(⌊x·w/tw⌋, ⌊y·h/th⌋) — pure integer
    * index math, so the resampled luma of the synthesized two-band images
    * stays closed-form and hash-oracle-checkable — then a REAL re-encode
    * of the resized raster (the emitted payload is a valid PNG a
    * downstream consumer can decode). Per-partition codec init, rows
    * stream through. */
  def resizeImages(spark: SparkSession, images: Dataset[ImageRow],
      targetW: Int, targetH: Int): Dataset[ResizedImage] = {
    require(targetW >= 1 && targetH >= 1, s"bad target ${targetW}x$targetH")
    import spark.implicits._
    images.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.png))
        // ImageIO.read signals "unrecognizable bytes" with null, not an
        // exception — convert to the codec-error posture the audio/video
        // decoders have (descriptive failure naming the asset).
        require(src != null, s"undecodable image payload for asset ${r.asset_id}")
        val (w, h) = (src.getWidth, src.getHeight)
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var sum = 0L
        var y = 0
        while (y < targetH) {
          val sy = (y.toLong * h / targetH).toInt
          var x = 0
          while (x < targetW) {
            val sx = (x.toLong * w / targetW).toInt
            val rgb = src.getRGB(sx, sy)
            out.setRGB(x, y, rgb)
            sum += (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        ResizedImage(r.asset_id, w.toLong, h.toLong,
          targetW.toLong, targetH.toLong, sum, bos.toByteArray)
      }
    }
  }

  /** Deterministic synthetic PNGs, REALLY encoded with `javax.imageio`:
    * per asset a two-band grayscale image — top half value a = id mod 256,
    * bottom half b = 7·id mod 256, width 2·(4 + id mod 30) (even), height
    * 4·(2 + 3·id mod 10) (multiple of 4) — so every decoded feature is a
    * closed-form integer function of the id and the whole
    * encode→(exchange)→decode round-trip is oracle-checkable. Encoding is
    * per-row imperative work, hence `mapPartitions` (preference (d),
    * SURVEY.md §4 — same justification as the decode pass). */
  def synthesizeImages(spark: SparkSession, documents: DataFrame): Dataset[ImageRow] = {
    import spark.implicits._
    documents.select(
        col("doc_id").as("asset_id"),
        (lit(2) * (lit(4) + pmod(col("doc_id"), lit(30)))).cast("int").as("w"),
        (lit(4) * (lit(2) + pmod(col("doc_id") * 3, lit(10)))).cast("int").as("h"),
        pmod(col("doc_id"), lit(256)).cast("int").as("a"),
        pmod(col("doc_id") * 7, lit(256)).cast("int").as("b"))
      .as[(Long, Int, Int, Int, Int)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        rows.map { case (id, w, h, a, b) =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            val v = if (y < h / 2) a else b
            val rgb = (v << 16) | (v << 8) | v
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          ImageRow(id, bos.toByteArray)
        }
      }
  }

  /** The REAL decode pass: `javax.imageio` PNG decode of the binary
    * payload, a luma sum over the decoded raster, and a 2× nearest-neighbor
    * downsample (resized(x,y) = src(2x,2y)) with its own luma sum — the
    * decode/feature-extract/resize chain of an image-training pipeline,
    * executed on the decoded pixels rather than a byte-slice stand-in.
    * One codec init per partition; rows stream through without
    * accumulating. */
  def decodeImageFeatures(spark: SparkSession,
      images: Dataset[ImageRow]): Dataset[ImageFeatures] = {
    import spark.implicits._
    images.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.png))
        require(img != null, s"undecodable image payload for asset ${r.asset_id}")
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += (img.getRGB(x, y) & 0xff); x += 1 }
          y += 1
        }
        val rw = w / 2
        val rh = h / 2
        var rsum = 0L
        var ry = 0
        while (ry < rh) {
          var rx = 0
          while (rx < rw) { rsum += (img.getRGB(rx * 2, ry * 2) & 0xff); rx += 1 }
          ry += 1
        }
        ImageFeatures(r.asset_id, w.toLong, h.toLong, sum,
          rw.toLong, rh.toLong, rsum)
      }
    }
  }

  final case class JpegRow(asset_id: Long, jpeg: Array[Byte])

  /** Deterministic synthetic JPEGs, REALLY encoded with `javax.imageio`'s
    * lossy JFIF writer (default quality): per asset a UNIFORM grayscale
    * raster, value v = id mod 256, width 8 + id mod 41, height
    * 6 + 3·id mod 29. Uniform rasters are the one input a lossy DCT codec
    * reproduces EXACTLY — a flat block has only a DC coefficient, whose
    * quantization at the default quality divides the scaled value; MCU
    * edge padding replicates the same value; and the fixed-point
    * RGB↔YCbCr converters are exact on r=g=b — verified exhaustively for
    * all 256 values and assorted (incl. odd, sub-MCU) dims in
    * `MultimodalSpec`. That exactness is what lets a genuinely lossy
    * codec sit under a hash-exact closed-form oracle
    * (`multimodal_jpeg`). Per-partition codec init, rows stream. */
  def synthesizeJpegs(spark: SparkSession, documents: DataFrame): Dataset[JpegRow] = {
    import spark.implicits._
    documents.select(
        col("doc_id").as("asset_id"),
        (lit(8) + pmod(col("doc_id"), lit(41))).cast("int").as("w"),
        (lit(6) + pmod(col("doc_id") * 3, lit(29))).cast("int").as("h"),
        pmod(col("doc_id"), lit(256)).cast("int").as("v"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        rows.map { case (id, w, h, v) =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (v << 16) | (v << 8) | v
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", bos)
          JpegRow(id, bos.toByteArray)
        }
      }
  }

  /** JPEG decode + features: the same decoded-pixel feature chain as
    * [[decodeImageFeatures]] (`ImageIO.read` sniffs the container, so the
    * PNG pass's decode/luma/resample code runs unchanged on JFIF bytes) —
    * the narrow rewrap is schema honesty, not a copy of the codec path. */
  def decodeJpegFeatures(spark: SparkSession,
      jpegs: Dataset[JpegRow]): Dataset[ImageFeatures] = {
    import spark.implicits._
    decodeImageFeatures(spark, jpegs.map(j => ImageRow(j.asset_id, j.jpeg)))
  }

  final case class BlockSignature(asset_id: Long, blocks: Array[Long])

  /** Perceptual block signature of each image: REAL `javax.imageio` decode,
    * then the mean luma of each cell in a `grid`×`grid` partition of the
    * raster — the blockhash-style fingerprint that survives re-encoding and
    * small edits, computed from decoded pixels (not payload bytes). Cell
    * boundaries are ⌊i·dim/grid⌋ so any dims work; means are floor-ints.
    * Same `mapPartitions` justification as [[decodeImageFeatures]]. */
  def blockSignatures(spark: SparkSession, images: Dataset[ImageRow],
      grid: Int = 4): Dataset[BlockSignature] = {
    import spark.implicits._
    images.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.png))
        require(img != null, s"undecodable image payload for asset ${r.asset_id}")
        val w = img.getWidth
        val h = img.getHeight
        val blocks = new Array[Long](grid * grid)
        var by = 0
        while (by < grid) {
          val y0 = by * h / grid; val y1 = (by + 1) * h / grid
          var bx = 0
          while (bx < grid) {
            val x0 = bx * w / grid; val x1 = (bx + 1) * w / grid
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { sum += (img.getRGB(x, y) & 0xff); x += 1 }
              y += 1
            }
            val n = (y1 - y0).toLong * (x1 - x0)
            blocks(by * grid + bx) = if (n == 0) 0L else sum / n
            bx += 1
          }
          by += 1
        }
        BlockSignature(r.asset_id, blocks)
      }
    }
  }

  /** Band view of a signature frame: one band per block-ROW, band key =
    * that row's block means quantized to nibbles (>>4), joined with '-'.
    * Pure integer expressions over the stored blocks — deriving bands from
    * a persisted index never touches pixels. */
  /** `blocks` rides along (r16 optimization, guide §8): the exact verify
    * metric is computed INSIDE the banded join, so the candidate-pair
    * table — the largest frame in the operator, quadratic in bucket
    * fill — is never shuffled again for a verify re-join, and the
    * dedup aggregate runs over the post-threshold survivors instead of
    * every raw candidate. The extra grid² longs per band row are a few
    * hundred bytes through the cap window's (band, key) exchange —
    * metadata-sized — versus re-shuffling the pair table twice. */
  /** `bkeys` (ALL bands' keys, grid short strings) rides on every band row
    * since the r16 min-band rewrite: the candidate join needs each side's
    * other-band keys to decide, in-join, whether an EARLIER band already
    * emits the pair — see [[nearDupImages]]. A few dozen bytes per band
    * row through the cap window's exchange, versus a full exchange +
    * aggregate of the quadratic pair table for the old distinct(). */
  private def bandKeys(sig: DataFrame, grid: Int): DataFrame =
    sig.select(col("asset_id"), col("blocks"),
        expr(s"transform(sequence(0, ${grid - 1}), r -> " +
          s"array_join(transform(slice(blocks, r * $grid + 1, $grid), " +
          "v -> string(v div 16)), '-'))").as("bkeys"))
      .select(col("asset_id"), col("blocks"), col("bkeys"),
        posexplode(col("bkeys")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "key"))

  /** Deterministic bucket cap (smallest ids win), as in minhashCandidates:
    * a megahit key (e.g. near-black thumbnails) stays C(cap,2), not C(n,2). */
  private def capBuckets(bands: DataFrame, maxBucket: Int): DataFrame =
    bands
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("key")).orderBy(col("asset_id"))))
      .where(col("rn") <= maxBucket).drop("rn")

  /** Post-cap band-survival bitmask per asset (bit b set ⟺ this asset's
    * band-b row survived [[capBuckets]]), attached to every band row by a
    * second window — an exchange over the band frame (4 rows/asset, a few
    * hundred bytes each), paid so the candidate join can test cap
    * survival of OTHER bands in-join. */
  private def withSurvivedMask(capped: DataFrame): DataFrame =
    capped.withColumn("mask",
      sum(expr("shiftleft(1L, band)")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("asset_id"))))

  /** True iff NO band earlier than this row's `band` would already emit
    * the (x, y) pair — i.e. no b' < band where both sides survived b's
    * cap AND their band-b' keys collide. Makes each qualifying pair emit
    * from exactly ONE band (its minimal matching-and-surviving band), so
    * the quadratic candidate table needs no dedup exchange at all
    * (r16, guide §2.4): the old shape emitted a pair once per shared
    * band and removed the copies with a full-table distinct(). Pure
    * integer/string comparisons over columns already on the band rows —
    * whole-stage codegen, evaluated inside the join. */
  /** Fan-out + cache of the capped band frame feeding the candidate
    * self/probe joins (r16 session 2). Two reasons, both measured:
    * (1) BOTH join sides reference this frame and the broadcast build
    * does not share work with the streamed side — one cached
    * materialization replaces two runs of the decode→band→cap→mask
    * subtree (the Dedup.minhashCandidatesNamed rationale); (2) the frame
    * is a few MB at bench SFs, so AQE's (correct, size-based) partition
    * coalescing collapses the mask window's exchange to ONE partition —
    * and with it the downstream candidate join, whose row fan-out is
    * ~bucketFill× its input and which AQE cannot see. The explicit
    * repartition to the session's configured shuffle parallelism keeps
    * the quadratic join eval off a single core — the Tables.apply
    * fan-out rationale: parallelism follows a session-scale conf, never
    * a local constant, and at cluster scale this is one cheap linear
    * exchange of a metadata-sized frame ahead of the operator's heavy
    * stage. */
  private def fannedBands(capped: DataFrame): DataFrame =
    capped.repartition(
        capped.sparkSession.sessionState.conf.numShufflePartitions)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  private def noEarlierBandMatch(nBands: Int, x: String = "x",
      y: String = "y"): Column =
    (0 until nBands - 1).foldLeft(lit(true))((acc, b) =>
      acc && !(col(s"$x.band") > b &&
        shiftright(col(s"$x.mask"), b).bitwiseAND(lit(1L)) === 1L &&
        shiftright(col(s"$y.mask"), b).bitwiseAND(lit(1L)) === 1L &&
        element_at(col(s"$x.bkeys"), b + 1) === element_at(col(s"$y.bkeys"), b + 1)))

  /** Exact verify metric — native codegen expression (the HOF fold it
    * replaces is CodegenFallback and allocates per pair, see
    * plans.SumAbsDiffL). Since r16 it is computed INSIDE the banded
    * candidate joins (blocks ride along on the band rows), so the pair
    * table is never re-shuffled for a verify join. */
  private def sumAbsDiff(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(
      graft.plans.SumAbsDiffL(
        org.apache.spark.sql.graftbridge.GraftBridge.expression(a),
        org.apache.spark.sql.graftbridge.GraftBridge.expression(b)))

  /** Near-duplicate image pairs by banded perceptual hash — the multimodal
    * tier of the dedup family, same scale shape as `Dedup.minhashCandidates`:
    * one band per block-ROW of the signature, band key = that row's block
    * means quantized to nibbles (>>4), candidates from a per-band equi-join
    * (never all-pairs), buckets capped at `maxBucket` smallest asset_ids,
    * then an exact verify over the full block vectors keeps pairs with
    * Σ|blockA−blockB| ≤ `maxSumAbsDiff`. Output: (asset_a, asset_b,
    * sum_abs_diff), asset_a < asset_b. Integer throughout ⇒ hash-exact
    * cross-engine. */
  def nearDupImages(spark: SparkSession, images: Dataset[ImageRow],
      grid: Int = 4, maxSumAbsDiff: Long = 128, maxBucket: Int = 1000): DataFrame = {
    // The signature subtree is referenced 4× below (both sides of the
    // banded self-join + both sides of the verify re-join); without a
    // persist each reference re-runs the imageio decode over every asset —
    // the expensive stage at scale. The cached frame is tiny (asset_id +
    // grid² longs, no pixels), and CacheManager keys entries by
    // canonicalized plan so repeated calls on the same input share one
    // LRU-evictable entry (same rationale as Queries.curateSurvivorsFrom).
    val sig = blockSignatures(spark, images, grid).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capped = fannedBands(
      withSurvivedMask(capBuckets(bandKeys(sig, grid), maxBucket)))
    // exact verify fused into the banded join (r16, guide §8): blocks
    // are already on both sides, so Σ|Δblock| is computed in-join and
    // the threshold filters in the same stage — no verify re-joins.
    // MIN-BAND emission (r16 session 2, guide §2.4): a pair colliding on
    // several bands used to be emitted once per band and deduped by a
    // full distinct() of the candidate table — the operator's largest
    // frame. noEarlierBandMatch keeps only the emission from the pair's
    // minimal matching-and-surviving band (decidable in-join from the
    // riding bkeys + cap-survival masks), so each qualifying pair is
    // produced exactly once and the candidate table never crosses an
    // exchange at all. Output set is IDENTICAL: same pairs, same pure
    // sum_abs_diff, one copy each.
    capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.asset_id") < col("y.asset_id") &&
          noEarlierBandMatch(grid))
      .select(col("x.asset_id").as("asset_a"), col("y.asset_id").as("asset_b"),
        sumAbsDiff(col("x.blocks"), col("y.blocks")).as("sum_abs_diff"))
      .where(col("sum_abs_diff") <= maxSumAbsDiff)
      .select(col("asset_a"), col("asset_b"), col("sum_abs_diff"))
  }

  /** Persistable signature index for incremental multimodal near-dup:
    * (asset_id, blocks ARRAY<BIGINT>) — grid² longs per asset, no pixels.
    * The ANN-family mirror of `Dedup.bandIndex`/`TextAnalysis.spanIndex`:
    * history payloads are decoded ONCE, when first indexed; every later
    * batch probes the stored integers. */
  def signatureIndex(spark: SparkSession, images: Dataset[ImageRow],
      grid: Int = 4): DataFrame =
    blockSignatures(spark, images, grid).toDF()

  /** Incremental [[nearDupImages]]: a new batch of images against a stored
    * [[signatureIndex]]. New-vs-history pairs come from an equi-join of the
    * batch's band keys against bands derived from the stored index (asset_a
    * = new, asset_b = historical, origin `history`); new-vs-new pairs from
    * the standard banded self-join (asset_a < asset_b, origin `batch`).
    * History PIXELS are never re-decoded — banding a stored signature is
    * integer expressions only — and history-vs-history pairs are never
    * recomputed (they were emitted when those batches were new). Both sides
    * bucket-capped as in the batch operator; the same exact Σ|Δblock|
    * verify runs over the union of batch signatures and the index.
    *
    * Cap semantics (same contract as `Dedup.minhashCandidatesIncremental`):
    * each SIDE truncates its own (band, key) buckets to the `maxBucket`
    * smallest asset_ids. For buckets under the cap — the normal case; run
    * exact dedup first so identical images never pile up — the output is
    * exactly [[nearDupImages]] over the union minus its history-history
    * pairs (the MultimodalSpec equivalence case). A bucket OVER the cap
    * diverges deterministically from the single-corpus run (which caps
    * across both sides at once) while keeping the same C(cap,2)-per-side
    * blowup bound — the bound is the contract there, not equivalence.
    *
    * `historyIndex` is referenced TWICE in the plan (banding + verify).
    * The intended backing is a parquet [[signatureIndex]] load — a few
    * integers per asset, cheap to rescan — so the operator does not
    * persist it; a caller passing a COMPUTED frame (e.g. an inline
    * synthesize→index chain) should persist it first or the computation
    * runs twice. */
  def nearDupImagesIncremental(spark: SparkSession, newImages: Dataset[ImageRow],
      historyIndex: DataFrame, grid: Int = 4, maxSumAbsDiff: Long = 128,
      maxBucket: Int = 1000): DataFrame = {
    // GRID-MISMATCH GUARD: a stored index built at a different grid
    // would slice garbage band keys and SumAbsDiffL's length-mismatch
    // null would silently drop every verify — a plausible-looking EMPTY
    // result for a misconfiguration (review r12; the loud-degeneration
    // posture of lshCorpus's dim probe). One cheap size probe per row.
    val hist = historyIndex.withColumn("blocks",
      when(size(col("blocks")) =!= grid * grid, raise_error(concat(
          lit(s"historyIndex grid mismatch: expected ${grid * grid} blocks, got "),
          size(col("blocks")).cast("string"))))
        .otherwise(col("blocks")))
    // Same 4-reference persist rationale as nearDupImages — only the NEW
    // batch is decoded, once. A batch asset ALREADY in the index
    // (retry/backfill re-ingest) is skipped: it was deduped when history
    // absorbed it, and keeping it would self-pair on its own band keys
    // and fan out every verify row through the doubled signature
    // (review r12 — the incremental tiers assume disjoint batches; this
    // makes the assumption enforced instead of implicit).
    val newSig = blockSignatures(spark, newImages, grid).toDF()
      .join(historyIndex.select(col("asset_id")), Seq("asset_id"),
        "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newBands = fannedBands(
      withSurvivedMask(capBuckets(bandKeys(newSig, grid), maxBucket)))
    val histBands = fannedBands(
      withSurvivedMask(capBuckets(bandKeys(hist, grid), maxBucket)))
    // same in-join verify fuse + min-band emission as nearDupImages
    // (r16, guide §8 / §2.4): sum_abs_diff is a pure function of the
    // pair and each pair is emitted from its minimal matching band where
    // BOTH sides survived their own cap (each side's mask records its
    // own per-side truncation — the incremental cap contract), so the
    // pair tables need no dedup exchange at all.
    val vsHistory = newBands.as("n")
      .join(histBands.as("h"),
        col("n.band") === col("h.band") && col("n.key") === col("h.key") &&
          noEarlierBandMatch(grid, "n", "h"))
      .select(col("n.asset_id").as("asset_a"), col("h.asset_id").as("asset_b"),
        sumAbsDiff(col("n.blocks"), col("h.blocks")).as("sum_abs_diff"))
      .where(col("sum_abs_diff") <= maxSumAbsDiff)
      .withColumn("origin", lit("history"))
    val vsBatch = newBands.as("x").join(newBands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.asset_id") < col("y.asset_id") &&
          noEarlierBandMatch(grid))
      .select(col("x.asset_id").as("asset_a"), col("y.asset_id").as("asset_b"),
        sumAbsDiff(col("x.blocks"), col("y.blocks")).as("sum_abs_diff"))
      .where(col("sum_abs_diff") <= maxSumAbsDiff)
      .withColumn("origin", lit("batch"))
    vsHistory.unionByName(vsBatch)
      .select(col("asset_a"), col("asset_b"), col("sum_abs_diff"), col("origin"))
  }

  final case class AudioRow(asset_id: Long, wav: Array[Byte])
  final case class AudioFeatures(asset_id: Long, sample_rate: Long,
    n_samples: Long, sum_abs: Long, max_abs: Long, n_zero_cross: Long,
    sum_sq: Long)

  /** REAL audio synthesis: a canonical 44-byte RIFF/WAVE PCM16-mono file
    * per asset, carrying a square wave whose rate/length/amplitude/period
    * are closed-form in the asset id — the audio leg of the
    * [[synthesizeImages]] pattern, with the same payoff: every decoded
    * feature is DuckDB-re-derivable arithmetically, so the WHOLE
    * decode chain is hash-oracle-checkable. Sample i is +amp while
    * ⌊i/period⌋ is even, −amp otherwise. */
  def synthesizeAudio(spark: SparkSession, documents: DataFrame): Dataset[AudioRow] = {
    import spark.implicits._
    documents.select(
        col("doc_id").as("asset_id"),
        (lit(8000) + pmod(col("doc_id"), lit(3)) * 4000).cast("int").as("rate"),
        (lit(400) + pmod(col("doc_id"), lit(50)) * 16).cast("int").as("n"),
        (lit(1000) + pmod(col("doc_id"), lit(100)) * 250).cast("int").as("amp"),
        (lit(2) + pmod(col("doc_id"), lit(9))).cast("int").as("period"))
      .as[(Long, Int, Int, Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, rate, n, amp, period) =>
          val dataLen = n * 2
          val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1) // PCM, mono
            .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
            .put("data".getBytes("US-ASCII")).putInt(dataLen)
          var i = 0
          while (i < n) {
            buf.putShort((if ((i / period) % 2 == 0) amp else -amp).toShort)
            i += 1
          }
          AudioRow(id, buf.array())
        }
      }
  }

  /** REAL audio decode: `javax.sound.sampled.AudioSystem` parses the
    * RIFF/WAVE container (format, rate, sample width — a malformed header
    * throws, it is a genuine codec path, not a byte-slice), then the
    * PCM16-LE samples feed integer signal features: total/max absolute
    * amplitude, energy (Σs²) and zero-crossing count — the standard cheap
    * audio-quality gates (silence, clipping, noise) a training pipeline
    * runs before anything model-based. Same per-partition `mapPartitions`
    * boundary as [[decodeImageFeatures]]; at 100 TB this streams inside
    * the scan stage, one codec init per partition. */
  def decodeAudioFeatures(spark: SparkSession,
      audio: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    import spark.implicits._
    audio.mapPartitions { rows =>
      rows.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.wav))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian, s"unsupported WAV shape for asset ${r.asset_id}: $fmt")
        val bytes = ais.readAllBytes()
        ais.close()
        val n = bytes.length / 2
        var sumAbs = 0L; var sumSq = 0L; var maxAbs = 0L; var zc = 0L
        var prev = 0; var i = 0
        while (i < n) {
          val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
          val a = math.abs(s).toLong
          sumAbs += a; sumSq += a * a
          if (a > maxAbs) maxAbs = a
          if (i > 0 && ((s < 0) != (prev < 0))) zc += 1
          prev = s; i += 1
        }
        AudioFeatures(r.asset_id, fmt.getSampleRate.toLong, n.toLong,
          sumAbs, maxAbs, zc, sumSq)
      }
    }
  }

  final case class VideoRow(asset_id: Long, gif: Array[Byte])
  final case class VideoFeatures(asset_id: Long, n_frames: Long, width: Long,
    height: Long, sum_luma_all: Long, first_mean_luma: Long,
    last_mean_luma: Long)

  /** REAL multi-frame video synthesis: an animated-GIF container per asset
    * (the one genuine multi-frame codec the JRE ships — LZW compression,
    * palettes, frame sequencing), frames being uniform-gray rasters whose
    * value is closed-form in (asset id, frame index): v(k) = (5·id + 17·k)
    * mod 256. Uniform frames palette-encode losslessly, so the decode is
    * bit-exact and oracle-checkable like the PNG/WAV legs. One writer per
    * partition (codec init boundary). */
  def synthesizeVideos(spark: SparkSession, documents: DataFrame): Dataset[VideoRow] = {
    import spark.implicits._
    documents.select(
        col("doc_id").as("asset_id"),
        (lit(8) + pmod(col("doc_id"), lit(16))).cast("int").as("w"),
        (lit(8) + pmod(col("doc_id") * 3, lit(12))).cast("int").as("h"),
        (lit(2) + pmod(col("doc_id"), lit(6))).cast("int").as("frames"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        // One writer per PARTITION; a per-row failure must not leave it
        // mid-sequence for the next row (round-9 review): each row closes
        // its ImageOutputStream in finally, and the writer is disposed
        // when the iterator is exhausted.
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        val it = rows.map { case (id, w, h, frames) =>
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          try {
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            var k = 0
            while (k < frames) {
              val v = (5 * id + 17 * k) % 256
              val img = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val rgb = (v << 16) | (v << 8) | v
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { img.setRGB(x, y, rgb.toInt); x += 1 }
                y += 1
              }
              writer.writeToSequence(
                new javax.imageio.IIOImage(img, null, null), null)
              k += 1
            }
            writer.endWriteSequence()
          } finally ios.close()
          VideoRow(id, bos.toByteArray)
        }
        closeOnExhaustion(it)(writer.dispose())
      }
  }

  /** Wrap an iterator so `cleanup` runs exactly once — the codec-disposal
    * hook for per-partition writers/readers. Two release paths share one
    * idempotence flag: the exhaustion hook frees eagerly on a full drain,
    * and a task-completion listener covers everything else — early
    * termination (limit/take/first stop consuming mid-iterator) and task
    * abort both end in task completion without draining, and on a
    * long-lived executor those would otherwise accumulate one undisposed
    * ImageIO plugin instance per task (ADVICE r9). Outside a task (plain
    * JVM tests) only the exhaustion hook applies. */
  private def closeOnExhaustion[T](it: Iterator[T])(cleanup: => Unit): Iterator[T] =
    new Iterator[T] {
      private var closed = false
      private def close(): Unit = if (!closed) { closed = true; cleanup }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => close()))
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) close()
        h
      }
      def next(): T = it.next()
    }

  /** REAL multi-frame decode: the GIF reader walks the container
    * (`getNumImages(true)` forces a full parse; a malformed payload
    * throws), decodes every frame raster and reduces it to integer luma
    * features — frame count, dims, total luma across frames, first/last
    * frame mean luma (the cheap scene-change/black-frame gates a video
    * training pipeline runs before sampling). Per-partition reader init,
    * rows stream through. */
  def decodeVideoFeatures(spark: SparkSession,
      videos: Dataset[VideoRow]): Dataset[VideoFeatures] = {
    import spark.implicits._
    videos.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      val it = rows.map { r =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.gif))
        try {
          reader.setInput(iis, false, false)
          val n = reader.getNumImages(true)
          require(n >= 1, s"asset ${r.asset_id}: empty GIF container")
          var total = 0L; var first = 0L; var last = 0L
          var w = 0L; var h = 0L
          var k = 0
          while (k < n) {
            val img = reader.read(k)
            if (k == 0) { w = img.getWidth.toLong; h = img.getHeight.toLong }
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) { sum += (img.getRGB(x, y) & 0xff); x += 1 }
              y += 1
            }
            total += sum
            val mean = sum / (img.getWidth.toLong * img.getHeight)
            if (k == 0) first = mean
            last = mean
            k += 1
          }
          VideoFeatures(r.asset_id, n.toLong, w, h, total, first, last)
        } finally iis.close()
      }
      closeOnExhaustion(it)(reader.dispose())
    }
  }

  final case class AssetRow(asset_id: Long, payload: Array[Byte], width: Int, height: Int)
  final case class DecodedRow(asset_id: Long, frames: Int, meanLuma: Double)

  /** STUB codec — deterministic fake standing in for an image/video decode.
    * Swap the body for a real decoder; the signature (bytes+dims in,
    * features out) and the per-partition init in [[decodeFeatures]] are the
    * production shape. */
  trait Codec extends Serializable {
    def decode(payload: Array[Byte], width: Int, height: Int): DecodedRow
  }
  object StubCodec extends Codec {
    def decode(payload: Array[Byte], width: Int, height: Int): DecodedRow = {
      val luma = if (payload.isEmpty) 0.0
        else payload.map(b => (b & 0xff).toDouble).sum / payload.length
      DecodedRow(-1L, frames = 1 + payload.length % 4, meanLuma = luma)
    }
  }

  /** The imperative decode pass: `mapPartitions` so codec setup happens once
    * per partition. This is preference-order (d) territory (SURVEY.md §4) —
    * justified only because decoding is genuinely per-row native work. */
  def decodeFeatures(spark: SparkSession, documents: DataFrame,
      codec: Codec = StubCodec): Dataset[DecodedRow] = {
    import spark.implicits._
    assets(documents)
      .select(col("asset_id"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[AssetRow]
      .mapPartitions { rows =>
        val c = codec // per-partition codec binding (init point for a real decoder)
        rows.map(r => c.decode(r.payload, r.width, r.height).copy(asset_id = r.asset_id))
      }
  }
}

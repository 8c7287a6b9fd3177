package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.10): media as opaque `binary`
  * columns with a typed metadata struct, plus a feature-extraction pass.
  *
  * The Spark-side plumbing — schema, batch iteration, partitioning — is
  * real; the codec is a STUB (this container has no image/audio libraries),
  * clearly marked below. A production build drops a JNI/javacv decoder into
  * [[Codec]] without touching the plan shape: the `mapPartitions` boundary
  * is where per-batch native decoding belongs (one codec init per
  * partition, not per row — same shape `mapInPandas` gives PySpark).
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
    val a = assets(documents)
      .select(col("asset_id"), col("payload"),
        ceil(octet_length(col("payload")) / lit(frameBytes.toDouble)).cast("int")
          .as("n_frames"))
    a.select(col("asset_id"), col("n_frames"),
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

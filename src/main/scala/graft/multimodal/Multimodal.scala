package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines (extension
  * set). Media assets are opaque `binary` columns plus a typed metadata
  * struct; decode / feature-extraction runs batched per partition.
  *
  * The decode step itself is STUBBED with a deterministic fake (this
  * container has no image/audio codecs — see the build brief); the
  * Spark-side plumbing is real and what actually matters at scale:
  *   - schema: (id, modality, data binary, meta struct)
  *   - per-partition batched processing via `mapPartitions` — one
  *     decoder/model instantiation per task, amortized over the
  *     partition's rows (the same batching contract a Pandas-UDF/Arrow
  *     path gives PySpark);
  *   - feature output as a fixed-width float array ready for the
  *     [[graft.operators.Similarity]] ANN operators.
  *
  * Swap [[fakeDecode]] for a real codec and nothing else changes.
  */
object Multimodal {

  val MetaType: StructType = StructType(
    Seq(
      StructField("modality", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))

  val AssetSchema: StructType = StructType(
    Seq(
      StructField("id", LongType),
      StructField("data", BinaryType),
      StructField("meta", MetaType)))

  /** Wrap any (id, string payload) frame as a binary asset table — the
    * ingest shim used by tests/queries on the synthetic corpus.
    */
  def assetsFromText(
      df: DataFrame,
      idCol: String,
      textCol: String,
      modality: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("data"),
      struct(
        lit(modality).as("modality"),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        (octet_length(col(textCol)) % 640).cast("int").as("width"),
        (octet_length(col(textCol)) % 480).cast("int").as("height"))
        .as("meta"))

  /** Deterministic fake "decode": derives a pseudo pixel-stat feature
    * vector from the raw bytes. Replace with a real codec in production
    * (??? boundary). Pure function of the bytes — reproducible anywhere.
    */
  def fakeDecode(data: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < data.length) {
      out(i % dim) += (data(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  case class AssetFeatures(
      id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      feature: Array[Float])

  /** Deterministic fake "resize": subsamples the byte payload to a
    * w×h-proportional length (stride sampling — stands in for a real
    * scaler, ??? boundary). Pure function of (bytes, w, h).
    */
  def fakeResize(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, math.min(data.length, w * h / 64))
    val stride = math.max(1, data.length / target)
    val out = new Array[Byte](if (data.isEmpty) 0 else (data.length + stride - 1) / stride)
    var i = 0
    var j = 0
    while (i < data.length) { out(j) = data(i); j += 1; i += stride }
    out
  }

  case class ResizedAsset(id: Long, width: Int, height: Int, data: Array[Byte])

  /** Batched per-partition resize — the image-preprocessing plumbing
    * (schema + batching real, scaler stubbed). One scaler instance per
    * task, rows streamed through it.
    */
  def resize(assets: DataFrame, w: Int, h: Int): Dataset[ResizedAsset] = {
    implicit val enc: ExpressionEncoder[ResizedAsset] =
      ExpressionEncoder[ResizedAsset]()
    assets.mapPartitions { rows: Iterator[Row] =>
      // real impl: val scaler = Codec.openScaler(w, h) — once per partition
      rows.map { r =>
        ResizedAsset(
          r.getLong(r.fieldIndex("id")),
          w,
          h,
          fakeResize(r.getAs[Array[Byte]]("data"), w, h))
      }
    }
  }

  case class Frame(id: Long, frame_idx: Int, data: Array[Byte])

  /** Deterministic frame sampling for video-modality assets: the payload
    * is treated as `nFrames` equal-size segments and every `everyN`-th
    * segment is emitted as one row — the explode shape a real
    * frame-sampler produces (decode stubbed as byte slicing).
    */
  def frameSample(
      assets: DataFrame,
      nFrames: Int,
      everyN: Int): Dataset[Frame] = {
    implicit val enc: ExpressionEncoder[Frame] = ExpressionEncoder[Frame]()
    assets.mapPartitions { rows: Iterator[Row] =>
      rows.flatMap { r =>
        val id = r.getLong(r.fieldIndex("id"))
        val data = r.getAs[Array[Byte]]("data")
        val seg = math.max(1, data.length / math.max(1, nFrames))
        (0 until nFrames by everyN).iterator
          .map { f =>
            val from = math.min(f * seg, data.length)
            val until = math.min(from + seg, data.length)
            Frame(id, f, java.util.Arrays.copyOfRange(data, from, until))
          }
          .filter(_.data.nonEmpty)
      }
    }
  }

  /** Batched per-partition feature extraction. One "decoder" per task
    * (here a no-op; a real codec would be constructed once per
    * partition), rows streamed through it — the scale-correct shape for
    * any heavy per-row native call.
    */
  def extractFeatures(assets: DataFrame, dim: Int = 16): Dataset[AssetFeatures] = {
    implicit val enc: ExpressionEncoder[AssetFeatures] =
      ExpressionEncoder[AssetFeatures]()
    assets.mapPartitions { rows: Iterator[Row] =>
      // real impl: val decoder = Codec.open(...)  — once per partition
      rows.map { r =>
        val id = r.getLong(r.fieldIndex("id"))
        val data = r.getAs[Array[Byte]]("data")
        val meta = r.getStruct(r.fieldIndex("meta"))
        AssetFeatures(
          id,
          meta.getLong(meta.fieldIndex("n_bytes")),
          meta.getInt(meta.fieldIndex("width")),
          meta.getInt(meta.fieldIndex("height")),
          fakeDecode(data, dim))
      }
    }
  }
}

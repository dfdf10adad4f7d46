package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side architecture is real and tested — schema contract,
  * partition-parallel batch iteration, feature-struct output — while the
  * actual media decode is a clearly-marked deterministic STUB (`fakeDecode`)
  * because no image/audio codecs exist in this environment. Swapping in a
  * real decoder changes one function, not the pipeline shape.
  */
object MultimodalOps {

  /** Output schema contract of the decode stage. The decoder always emits
    * a features array; the column is declared nullable because that is
    * what a typed Dataset pipeline naturally carries for reference-typed
    * fields (tightening it would require an extra plan node for zero
    * semantic gain). */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = true)))

  /** STUB decoder: deterministic pseudo-features from the raw bytes.
    * ??? replace with a real codec (JPEG/PNG/wav decode) when available —
    * the signature (bytes in, frame count + feature vector out) is the
    * real contract. */
  private[ops] def fakeDecode(bytes: Array[Byte]): (Int, Array[Float]) = {
    val frameSize = 64
    val nFrames = bytes.length / frameSize + 1
    var h = 1125899906842597L
    val feats = new Array[Float](8)
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    var f = 0
    while (f < 8) {
      // spread the rolling hash into [0,1) per feature slot
      feats(f) = (((h >>> (f * 8)) & 0xff).toFloat) / 256.0f
      f += 1
    }
    (nFrames, feats)
  }

  /** Batch decode/feature-extract over a media frame:
    * (id, media binary) → featureSchema rows. Runs as per-partition
    * imperative batch work — the one place `mapPartitions` is the right
    * tool (SURVEY §2.3 preference order (d)) because decoding is opaque
    * byte crunching no SQL expression can represent. */
  def decodeFeatures(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (nFrames, feats) = fakeDecode(bytes)
          (id, bytes.length, nFrames, feats.toSeq)
        }
      }
      .toDF(featureSchema.fieldNames.toSeq: _*)
      // typed Dataset mapPartitions (Tungsten-encoded both sides, no RDD
      // drop-down); cast restores the exact declared contract (float array,
      // non-null flags)
      .select(featureSchema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }

  /** "Resize" for image-like media, STUB transform: keep every `factor`-th
    * byte — the plumbing (binary in, smaller binary + typed metadata out,
    * per-partition batches) is the real contract; a codec-backed resampler
    * swaps in for the byte-skip without touching the pipeline shape. */
  def resize(df: DataFrame, idCol: String, mediaCol: String,
      factor: Int = 4): DataFrame = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out = new Array[Byte]((bytes.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
          (id, bytes.length, out.length, out)
        }
      }
      .toDF("media_id", "orig_len", "resized_len", "resized")
  }

  /** Frame sampling for video-like media: every `stride`-th fixed-size
    * frame, at most `maxFrames` per document — the standard shape for
    * sampling training frames out of long media without decoding all of it.
    * Stays in the typed Dataset world (`Dataset.mapPartitions` with tuple
    * encoders — no RDD drop-down, Tungsten-encoded both sides); the frame
    * SLICING is real byte work, only interpretation of the bytes would need
    * a codec. One output row per sampled frame: (media_id, frame_idx,
    * frame_len, first_byte). */
  def sampleFrames(df: DataFrame, idCol: String, mediaCol: String,
      frameSize: Int = 64, stride: Int = 4, maxFrames: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          Iterator.range(0, maxFrames)
            .map(_ * stride)
            .takeWhile(fi => fi * frameSize < bytes.length)
            .map { fi =>
              val start = fi * frameSize
              val len = math.min(frameSize, bytes.length - start)
              (id, fi, len, bytes(start) & 0xff)
            }
        }
      }
      .toDF("media_id", "frame_idx", "frame_len", "first_byte")
  }
}

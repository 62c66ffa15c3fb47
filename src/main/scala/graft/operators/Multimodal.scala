package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads with typed metadata
  * and a partition-wise feature-extraction kernel.
  *
  * The Spark-side shape is real — binary column, typed Dataset, batched
  * per-partition kernel invocation (where an image/audio decoder would run).
  * The decode step itself is a clearly-marked deterministic stub
  * ([[FakeDecoder]]): this container has no media libraries, so the stub
  * computes (byte length, first byte, md5) — exactly the metadata a real
  * decoder would surface alongside features, and exactly reproducible by the
  * oracle.
  *
  * Scale notes: `mapPartitions` keeps the decoder amortized per partition
  * (load model/codec once per partition, not per row), payloads never pass
  * through a shuffle (extract features first, then drop the payload), and
  * partitioning stays whatever the upstream source chose.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, byte_len: Int, first_byte: Int, content_md5: String)

  /** Deterministic stand-in for a media decoder. A real implementation
    * (image resize, audio frames, …) replaces `decode` only — the Spark
    * plumbing around it is unchanged. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, String) = {
      val md  = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(payload).map("%02x".format(_)).mkString
      (payload.length, if (payload.isEmpty) -1 else payload(0) & 0xff, hex)
    }
  }

  /** Attach the binary payload column (here: UTF-8 of the text column —
    * the corpus has no real media; the column type and flow are what's
    * exercised). */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("binary").as("payload"))

  /** Partition-wise feature extraction over binary payloads. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init happens here (codec / model load in real use)
      rows.map { r =>
        val (len, first, hex) = FakeDecoder.decode(r.payload)
        MediaFeatures(r.doc_id, len, first, hex)
      }
    }
  }

  final case class FrameRow(doc_id: Long, frame_idx: Int, frame_md5: String)

  /** Frame-sampling kernel (the video shape): the payload is a stream of
    * `frameBytes`-sized frames; keep every `stride`-th complete frame and
    * fingerprint it (md5 over the frame's UPPERCASE hex encoding — hex
    * strings are the engine-portable currency; raw-blob md5 is not
    * oracle-expressible). Rows are processed in batches of `batchSize` —
    * the Arrow/pandas-batch analog: a real codec initializes and amortizes
    * per batch, and the batch boundary is where vectorized decode would
    * run. Incomplete trailing bytes are dropped (a demuxer's behavior). */
  def sampleFrames(
      media: DataFrame,
      frameBytes: Int,
      stride: Int,
      batchSize: Int = 64): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch init (decoder state) would live here
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.iterator.flatMap { r =>
          val nFrames = r.payload.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            val frame = java.util.Arrays.copyOfRange(r.payload, f * frameBytes, (f + 1) * frameBytes)
            val hex   = frame.map("%02X".format(_)).mkString
            md.reset()
            FrameRow(r.doc_id, f, md.digest(hex.getBytes("US-ASCII")).map("%02x".format(_)).mkString)
          }
        }
      }
    }
  }

  /** dHash perceptual fingerprint (the image near-dup signature): sample
    * the payload to a (w+1)×h grid ([[resizeStub]] — a real decoder
    * swaps in pixel luminance, the hash math is unchanged), then bit
    * (r,c) = 1 iff grid[r][c+1] > grid[r][c], packed into one long
    * (`w·h ≤ 60` bits). Gradient signs survive brightness/contrast
    * shifts, which is why dHash is the standard cheap image fingerprint.
    * Pure per-row after the sampling kernel — zero shuffle. */
  def dHash(media: DataFrame, w: Int = 8, h: Int = 7, batchSize: Int = 64): DataFrame = {
    require(w >= 1 && h >= 1 && w * h <= 60, s"w*h must be <= 60 bits, got ${w * h}")
    val grid = resizeStub(media, w + 1, h, batchSize).toDF()
    val hash = (0 until h).flatMap { r =>
      (0 until w).map { c =>
        val pos = r * (w + 1) + c // 0-based grid offset of (r, c)
        when(element_at(col("thumb"), pos + 2) > element_at(col("thumb"), pos + 1),
          lit(1L << (r * w + c))).otherwise(lit(0L))
      }
    }.reduce(_ + _)
    grid.select(col("doc_id"), hash.as("dhash"))
  }

  /** Image near-duplicate pairs over [[dHash]] signatures via the shared
    * banded-pigeonhole hamming join ([[TextAnalysis.bandedHammingNearDup]])
    * — the multimodal face of the simhash dedup family. */
  def dHashNearDup(
      media: DataFrame,
      w: Int = 8,
      h: Int = 7,
      nBands: Int = 4,
      maxHamming: Int = 3,
      batchSize: Int = 64): DataFrame =
    TextAnalysis.bandedHammingNearDup(
      dHash(media, w, h, batchSize), "doc_id", "dhash", w * h, nBands, maxHamming)

  final case class ThumbRow(doc_id: Long, thumb: Seq[Int])

  /** Resize kernel (the image shape): deterministic nearest-neighbor
    * "resize" of the payload byte stream to a fixed w×h sample grid —
    * sample j reads byte floor(j·len/(w·h)). A real image decoder replaces
    * the byte sampling with pixel resampling; the schema (fixed-size int
    * grid per row), batching, and partition flow are identical. */
  def resizeStub(media: DataFrame, w: Int, h: Int, batchSize: Int = 64): Dataset[ThumbRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    val n = w * h
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val len = r.payload.length
          val thumb =
            if (len == 0) Seq.fill(n)(0)
            else (0 until n).map(j => r.payload((j.toLong * len / n).toInt) & 0xff)
          ThumbRow(r.doc_id, thumb)
        }
      }
    }
  }
}

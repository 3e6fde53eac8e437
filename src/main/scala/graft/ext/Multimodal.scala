package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (build brief): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, plus a feature-extract
  * stage whose Spark-side shape (schema, batching, partition parallelism)
  * is real while the codec itself is stubbed — the image/audio libraries
  * are not available in this environment, so `decodeStub` derives a
  * deterministic fake feature vector from the bytes. Swapping in a real
  * codec changes ONE function body, not the pipeline.
  *
  * Scale notes: binary payloads never shuffle — metadata extraction is a
  * narrow projection, and downstream joins/aggregations use the digest or
  * the (small) feature vector. Real decode belongs in `mapPartitions`
  * over batched rows (amortizing codec init per partition, exactly like
  * a Pandas-UDF batch on the PySpark side); `decodeFeatures` shows that
  * structure.
  */
object Multimodal {

  /** Fixed-window payload chunking: one row per `chunkSize`-char window
    * of the payload, with per-chunk length and digest — the chunking
    * stage an audio/video pipeline runs before per-chunk decode (byte
    * windows on a binary column; char windows here on the text
    * stand-in). The explode is bounded by payload length and row-local:
    * no shuffle, and chunk rows carry only their own slice — the full
    * payload is never duplicated per chunk downstream of the project.
    */
  def chunkPayload(df: DataFrame, idCol: String, payloadCol: String,
      chunkSize: Int = 64): DataFrame = {
    require(chunkSize > 0)
    df.select(col(idCol), col(payloadCol).as("__p"))
      .select(col(idCol), col("__p"),
        explode(expr(
          s"if(length(__p) = 0, array(), sequence(0, cast((length(__p) - 1) / $chunkSize as int)))"))
          .as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        expr(s"substring(__p, chunk_idx * $chunkSize + 1, $chunkSize)").as("__c"))
      .select(col(idCol), col("chunk_idx"),
        length(col("__c")).cast("long").as("chunk_len"),
        md5(col("__c")).as("chunk_md5"))
  }

  /** Typed metadata over an opaque binary column: byte length, digest,
    * magic-prefix hex. Pure projection — codegen'd, no shuffle.
    */
  def withMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(binCol)).cast("long"))
      .withColumn("content_digest", md5(col(binCol)))
      .withColumn("magic", hex(expr(s"substring($binCol, 1, 4)")))

  /** Feature dimension of the stub decoder. */
  val StubDims = 8

  /** STUB — deterministic fake "decode + feature extract": derives
    * `StubDims` floats from the content digest. A real implementation
    * replaces this body with an actual codec (e.g. JPEG decode + pooled
    * embedding); signature and pipeline stay identical.
    */
  private[ext] def stubFeatures(bytes: Array[Byte]): Array[Float] = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    (0 until StubDims).map { i =>
      // two digest bytes per dim → [-1, 1)
      (((digest(2 * i) & 0xff) << 8 | (digest(2 * i + 1) & 0xff)) - 32768) / 32768.0f
    }.toArray
  }

  /** Batched per-partition decode: the production shape for codec work —
    * one codec context per partition, rows streamed through it. Returns
    * (passthrough columns..., features array<float>).
    */
  def decodeFeatures(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        "features",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // (real codec init would happen once, here)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ stubFeatures(bytes).toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** STUB — deterministic fake "decode → scale → re-encode": digest of
    * (bytes, target dims). A real implementation swaps this body for an
    * image codec; the pipeline below is unchanged.
    */
  private[ext] def stubResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes ++ s"${w}x$h".getBytes("UTF-8"))

  /** Image resize stage: per-partition batched re-encode producing
    * (passthrough..., resized binary, width, height). Same codec-per-
    * partition shape as [[decodeFeatures]]; row count unchanged; binary
    * stays columnar and never shuffles.
    */
  def resize(df: DataFrame, binCol: String, width: Int, height: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("resized", BinaryType),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq ++ Seq(stubResize(bytes, width, height), width, height))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** STUB — deterministic fake frame extraction: frame count derived
    * from payload length (one per 256 bytes, ≥1), each frame's bytes a
    * digest of (payload, index). A real implementation demuxes the
    * container and decodes the keyframe at `idx`.
    */
  private[ext] def stubFrameCount(bytes: Array[Byte]): Int =
    math.max(1, bytes.length / 256)

  private[ext] def stubFrame(bytes: Array[Byte], idx: Int): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes ++ s"frame:$idx".getBytes("UTF-8"))

  /** Video frame sampling: one output row per kept frame — every
    * `everyNth` frame up to `maxFrames` per video. The 1→N explode
    * happens inside the per-partition iterator (lazily — no frame list
    * materialized per video), which is the production demux shape: a
    * container is opened once and frames stream out. Output adds
    * (frame_idx int, frame binary).
    */
  def frameSample(df: DataFrame, binCol: String,
      everyNth: Int = 1, maxFrames: Int = Int.MaxValue): DataFrame = {
    require(everyNth >= 1 && maxFrames >= 1)
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        (0 until stubFrameCount(bytes) by everyNth).iterator.take(maxFrames).map { i =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(i, stubFrame(bytes, i)))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}

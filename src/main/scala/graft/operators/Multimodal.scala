package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns over the relational substrate
  * (builder brief): media travels as an opaque `binary` column plus typed
  * metadata; decode / feature-extract / frame-sample run as distributed
  * map operators.
  *
  * The actual codec work is STUBBED — this container has no image/audio
  * libraries — behind `decodeStub`: it parses a deterministic fake header
  * (magic "GFTM" + type + width + height, written by [[fakeMedia]]) where
  * a real deployment would call the codec. Everything around the stub is
  * real and load-bearing: schemas, null handling for corrupt payloads,
  * the mapPartitions batch shape (amortizing per-partition decoder/model
  * init — the JVM analog of `mapInPandas` batching), and partition-count
  * guidance for ~MB-sized payloads (`repartitionForMedia`).
  */
object Multimodal {

  val Magic: Array[Byte] = "GFTM".getBytes("US-ASCII")

  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("payload_bytes", IntegerType)))

  /** Test/dev helper: a deterministic fake media payload. Layout:
    * GFTM | type(1B: 0=img,1=audio,2=video) | width(4B) | height(4B) |
    * seed-derived payload. A real pipeline reads real image bytes here. */
  def fakeMedia(mediaType: Int, w: Int, h: Int, seed: Long,
      payloadLen: Int = 256): Array[Byte] = {
    val out = new Array[Byte](13 + payloadLen)
    System.arraycopy(Magic, 0, out, 0, 4)
    out(4) = mediaType.toByte
    intTo(out, 5, w); intTo(out, 9, h)
    var i = 0
    var s = seed
    while (i < payloadLen) { s = Hashing.mix64(s); out(13 + i) = (s & 0xff).toByte; i += 1 }
    out
  }
  private def intTo(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >> 24).toByte; b(off + 1) = (v >> 16).toByte
    b(off + 2) = (v >> 8).toByte; b(off + 3) = v.toByte
  }
  private def intAt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** STUB decode: header → metadata struct; corrupt/foreign payloads → null
    * (the schema and null-contract are what a real decoder must honor). */
  private def decodeStub(bytes: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (bytes == null || bytes.length < 13 ||
        !bytes.take(4).sameElements(Magic)) None
    else {
      val t = bytes(4) match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"; case _ => "unknown"
      }
      Some((t, intAt(bytes, 5), intAt(bytes, 9), bytes.length - 13))
    }
  }

  /** Attach decoded metadata (`meta` struct column; null when the payload
    * doesn't decode). */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame = {
    val decodeUdf = udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
      override def call(b: Array[Byte]): Row =
        decodeStub(b).map { case (t, w, h, p) => Row(t, w, h, p) }.orNull
    }, metaSchema)
    df.withColumn("meta", decodeUdf(col(binCol)))
  }

  /** Feature extraction via mapPartitions — the JVM shape of mapInPandas:
    * per-partition "model" init (stubbed), then a streamed batch loop.
    * Output: (passthrough columns..., embedding array<float>). */
  def embedMedia(df: DataFrame, binCol: String, dim: Int = 16): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add("embedding", ArrayType(FloatType))
    val binIdx = inSchema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // REAL pipeline: load the vision/audio model once per partition here.
      val model = new StubEncoder(dim)
      rows.map { r =>
        val emb = model.encode(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq :+ emb)
      }
    }(Encoders.row(outSchema))
  }

  /** STUB encoder: deterministic hash-derived unit vector — stands in for
    * a real model; shape/dtype contract is the real one. */
  private final class StubEncoder(dim: Int) extends Serializable {
    def encode(bytes: Array[Byte]): Array[Float] = {
      if (bytes == null) return null
      val out = new Array[Float](dim)
      var s = 0L
      var i = 0
      while (i < bytes.length) { s = Hashing.mix64(s ^ bytes(i)); i += 1 }
      var norm = 0.0
      i = 0
      while (i < dim) {
        s = Hashing.mix64(s)
        out(i) = ((s & 0xffff).toInt - 32768) / 32768.0f
        norm += out(i) * out(i); i += 1
      }
      val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0
      while (i < dim) { out(i) *= inv; i += 1 }
      out
    }
  }

  /** Resize: binary → binary with the target dimensions (STUB rewrites
    * the header and decimates the payload proportionally to the area
    * ratio; a real pipeline calls the codec's scaler). Corrupt payloads
    * → null, matching the decode contract. The operator stays a pure
    * column map — resizing 10⁹ images is embarrassingly parallel and
    * must never leave the executor. */
  def resizeMedia(df: DataFrame, binCol: String, outCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    val resizeUdf = udf { (b: Array[Byte]) =>
      decodeStub(b) match {
        case None => null
        case Some((_, w, h, payloadLen)) =>
          val ratio = math.min(
            (targetW.toLong * targetH).toDouble / math.max(w.toLong * h, 1L), 1.0)
          val newLen = math.max((payloadLen * ratio).toInt, 1)
          val out = new Array[Byte](13 + newLen)
          System.arraycopy(b, 0, out, 0, 13)
          intTo(out, 5, targetW); intTo(out, 9, targetH)
          val step = math.max(payloadLen / newLen, 1)
          var k = 0
          while (k < newLen) { out(13 + k) = b(13 + math.min(k * step, payloadLen - 1)); k += 1 }
          out
      }
    }
    df.withColumn(outCol, resizeUdf(col(binCol)))
  }

  /** Frame sampling: one row per sampled frame (frame_idx, frame binary).
    * STUB slices the payload into `n` even chunks; a real video pipeline
    * seeks keyframes. Explode keeps it distributed — no driver collect. */
  def sampleFrames(df: DataFrame, binCol: String, n: Int): DataFrame = {
    val sliceUdf = udf { (b: Array[Byte]) =>
      if (b == null || b.length < 13) null
      else {
        val payload = java.util.Arrays.copyOfRange(b, 13, b.length)
        val step = math.max(payload.length / n, 1)
        (0 until math.min(n, payload.length)).map { k =>
          (k, java.util.Arrays.copyOfRange(payload, k * step,
            math.min(k * step + step, payload.length)))
        }
      }
    }
    df.withColumn("_frames", sliceUdf(col(binCol)))
      .withColumn("_f", explode(col("_frames")))
      .withColumn("frame_idx", col("_f._1"))
      .withColumn("frame", col("_f._2"))
      .drop("_frames", "_f")
  }

  /** Partition sizing for media tables: ~MB payloads want far fewer rows
    * per partition than relational rows — target bytes per task, not row
    * counts. */
  def repartitionForMedia(df: DataFrame, avgPayloadBytes: Long,
      targetPartitionBytes: Long = 128L << 20): DataFrame = {
    val rowsPerPartition = math.max(targetPartitionBytes / math.max(avgPayloadBytes, 1), 1)
    val n = math.max((df.count() / rowsPerPartition).toInt, 1)
    df.repartition(n)
  }
}

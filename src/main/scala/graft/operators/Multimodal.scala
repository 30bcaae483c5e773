package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns over the relational substrate
  * (builder brief): media travels as an opaque `binary` column plus typed
  * metadata; decode / feature-extract / resize / frame-sample run as
  * distributed map operators.
  *
  * The decoders are GENUINE pure-JVM binary parsers for three public
  * formats — BMP (24-bit uncompressed BITMAPINFOHEADER), WAV (RIFF PCM),
  * and Y4M (YUV4MPEG2, C444) — so the pipeline exercises real byte-level
  * failure modes: bad magic, truncated headers, header-declared sizes
  * exceeding the actual payload, unsupported bpp/compression. Every
  * failure decodes to a NULL column, never a task failure (the loader
  * contract: one corrupt image in 10⁹ must not kill the job). Only the
  * ML *model* stays stubbed (the hash-derived embedding in
  * [[embedMedia]] — this container has no model runtime); the byte-level
  * decode, pixel access, resize resample and frame demux are real.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("payload_bytes", IntegerType)))

  // ------------------------------------------------------------ generators
  // Deterministic REAL-format payloads (seed-derived pixels/samples) for
  // tests and the value gate; a production pipeline reads crawl bytes.

  /** 24-bit uncompressed BMP, rows bottom-up, 4-byte row padding. */
  def bmpMedia(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0)
    val rowSize = ((3 * w + 3) / 4) * 4
    val pixelBytes = rowSize * h
    val out = new Array[Byte](54 + pixelBytes)
    out(0) = 'B'; out(1) = 'M'
    leInt(out, 2, 54 + pixelBytes) // file size
    leInt(out, 10, 54) // pixel array offset
    leInt(out, 14, 40) // BITMAPINFOHEADER size
    leInt(out, 18, w); leInt(out, 22, h)
    out(26) = 1 // planes
    out(28) = 24 // bpp
    leInt(out, 30, 0) // BI_RGB
    leInt(out, 34, pixelBytes)
    var s = seed
    var i = 0
    while (i < pixelBytes) { s = Hashing.mix64(s); out(54 + i) = (s & 0xff).toByte; i += 1 }
    out
  }

  /** RIFF/WAVE, PCM 16-bit little-endian. */
  def wavMedia(sampleRate: Int, channels: Int, nSamples: Int,
      seed: Long): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nSamples >= 0)
    val dataBytes = nSamples * channels * 2
    val out = new Array[Byte](44 + dataBytes)
    text(out, 0, "RIFF"); leInt(out, 4, 36 + dataBytes); text(out, 8, "WAVE")
    text(out, 12, "fmt "); leInt(out, 16, 16)
    leShort(out, 20, 1) // PCM
    leShort(out, 22, channels); leInt(out, 24, sampleRate)
    leInt(out, 28, sampleRate * channels * 2) // byte rate
    leShort(out, 32, channels * 2); leShort(out, 34, 16) // block align, bits
    text(out, 36, "data"); leInt(out, 40, dataBytes)
    var s = seed
    var i = 0
    while (i < dataBytes) { s = Hashing.mix64(s); out(44 + i) = (s & 0xff).toByte; i += 1 }
    out
  }

  /** YUV4MPEG2 (C444: w·h·3 bytes per frame), `frames` FRAME chunks. */
  def y4mMedia(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0 && frames >= 0)
    val header = s"YUV4MPEG2 W$w H$h F25:1 C444\n".getBytes("US-ASCII")
    val frameBytes = w * h * 3
    val fmark = "FRAME\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + frames * (fmark.length + frameBytes))
    System.arraycopy(header, 0, out, 0, header.length)
    var off = header.length
    var s = seed
    var f = 0
    while (f < frames) {
      System.arraycopy(fmark, 0, out, off, fmark.length); off += fmark.length
      var i = 0
      while (i < frameBytes) { s = Hashing.mix64(s); out(off + i) = (s & 0xff).toByte; i += 1 }
      off += frameBytes; f += 1
    }
    out
  }

  private def text(b: Array[Byte], off: Int, s: String): Unit = {
    val a = s.getBytes("US-ASCII"); System.arraycopy(a, 0, b, off, a.length)
  }
  private def leInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }
  private def leShort(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
  }
  private def leIntAt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def leShortAt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  // -------------------------------------------------------------- decoders

  /** Parsed BMP: (w, h, rowSize, pixel-array offset); None on any
    * malformation — short header, wrong magic, non-24bpp, compressed,
    * nonsense dimensions, or pixel data truncated vs the header claim. */
  private def parseBmp(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val offBits = leIntAt(b, 10)
    val w = leIntAt(b, 18)
    // top-down BMPs (negative biHeight) are an unsupported variant:
    // every pixel accessor here assumes bottom-up row order, so abs()ing
    // the height would silently emit vertically flipped output — reject
    // to null like any other unsupported shape (decode-to-null contract)
    val h = leIntAt(b, 22)
    val bpp = leShortAt(b, 28)
    val compression = leIntAt(b, 30)
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
    if (bpp != 24 || compression != 0) return None
    if (offBits < 54 || offBits > b.length) return None
    val rowSize = ((3L * w + 3) / 4) * 4
    if (offBits + rowSize * h > b.length) return None // truncated pixels
    Some((w, h, rowSize.toInt, offBits))
  }

  /** Parsed WAV: (sampleRate, channels, dataBytes). Walks RIFF chunks;
    * None unless a PCM fmt chunk and an untruncated data chunk exist. */
  private def parseWav(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    // the walk offset is a LONG: a corrupt chunk declaring a size near
    // Int.MaxValue must step past the buffer end and decode to null, not
    // wrap negative and throw out of the UDF (a crafted WAV would
    // otherwise fail the task, violating the decode-to-null contract)
    var off = 12L
    var fmt: Option[(Int, Int)] = None // (sampleRate, channels)
    var data: Option[Int] = None
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val o = off.toInt // off + 8 <= length, so the Int cast is exact
      val size = leIntAt(b, o + 4)
      if (size < 0) return None
      val id = new String(b, o, 4, "US-ASCII")
      if (id == "fmt ") {
        if (o + 8 + 16 > b.length || size < 16) return None
        val audioFormat = leShortAt(b, o + 8)
        if (audioFormat != 1) return None // PCM only
        fmt = Some((leIntAt(b, o + 12), leShortAt(b, o + 10)))
      } else if (id == "data") {
        if (o + 8 + size.toLong > b.length) return None // truncated data
        data = Some(size)
      }
      off += 8L + size.toLong + (size & 1) // RIFF chunks are 2-byte aligned
    }
    for ((sr, ch) <- fmt; d <- data if sr > 0 && ch > 0) yield (sr, ch, d)
  }

  /** Parsed Y4M: (w, h, frameCount, frame offsets). C444 only (what the
    * generator emits); None on malformed params or a truncated frame. */
  private def parseY4m(b: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    val magic = "YUV4MPEG2".getBytes("US-ASCII")
    if (b.length < magic.length + 1) return None
    var i = 0
    while (i < magic.length) { if (b(i) != magic(i)) return None; i += 1 }
    var nl = i
    while (nl < b.length && b(nl) != '\n') nl += 1
    if (nl >= b.length) return None
    val params = new String(b, i, nl - i, "US-ASCII").trim.split("\\s+")
    var w = -1; var h = -1; var c = "420" // Y4M default colourspace
    for (p <- params if p.nonEmpty) p.charAt(0) match {
      case 'W' => w = p.drop(1).toIntOption.getOrElse(-1)
      case 'H' => h = p.drop(1).toIntOption.getOrElse(-1)
      case 'C' => c = p.drop(1)
      case _ => ()
    }
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
    val frameBytes = c match {
      case "444" => 3L * w * h
      case "420" | "420jpeg" | "420mpeg2" | "420paldv" => 3L * w * h / 2
      case _ => return None
    }
    val fmark = "FRAME".getBytes("US-ASCII")
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    var off = nl + 1
    while (off < b.length) {
      if (off + fmark.length > b.length) return None
      var k = 0
      while (k < fmark.length) { if (b(off + k) != fmark(k)) return None; k += 1 }
      var e = off + fmark.length // frame params run to the newline
      while (e < b.length && b(e) != '\n') e += 1
      if (e >= b.length || e + 1 + frameBytes > b.length) return None
      offs += e + 1
      off = e + 1 + frameBytes.toInt
    }
    Some((w, h, frameBytes.toInt, offs.toArray))
  }

  /** Route on magic → typed metadata; any malformation → None. */
  private[graft] def decode(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b == null || b.length < 2) None
    else if (b(0) == 'B' && b(1) == 'M')
      parseBmp(b).map { case (w, h, rowSize, _) => ("image", w, h, rowSize * h) }
    else if (b(0) == 'R' && b(1) == 'I')
      parseWav(b).map { case (sr, ch, d) => ("audio", sr, ch, d) }
    else if (b(0) == 'Y' && b(1) == 'U')
      parseY4m(b).map { case (w, h, frameBytes, offs) =>
        ("video", w, h, offs.length * frameBytes) }
    else None
  }

  /** Attach decoded metadata (`meta` struct column; null when the payload
    * doesn't decode). width/height carry the format's two leading
    * dimensions: image/video → pixels; audio → (sample_rate, channels). */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame = {
    val decodeUdf = udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
      override def call(b: Array[Byte]): Row =
        decode(b).map { case (t, w, h, p) => Row(t, w, h, p) }.orNull
    }, metaSchema)
    df.withColumn("meta", decodeUdf(col(binCol)))
  }

  /** REAL pixel statistics (images only): mean B/G/R over the decoded
    * 24-bit pixel array — the feature-extraction shape with a genuine
    * byte-level inner loop. Non-image / corrupt → null struct. */
  def imageStats(df: DataFrame, binCol: String, outCol: String = "stats"): DataFrame = {
    val statsSchema = StructType(Seq(
      StructField("mean_b", DoubleType), StructField("mean_g", DoubleType),
      StructField("mean_r", DoubleType)))
    val statsUdf = udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
      override def call(b: Array[Byte]): Row = {
        if (b == null) return null
        parseBmp(b) match {
          case None => null
          case Some((w, h, rowSize, off)) =>
            var (sb, sg, sr) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              val ro = off + y * rowSize
              var x = 0
              while (x < w) {
                sb += b(ro + 3 * x) & 0xff
                sg += b(ro + 3 * x + 1) & 0xff
                sr += b(ro + 3 * x + 2) & 0xff
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            Row(sb.toDouble / n, sg.toDouble / n, sr.toDouble / n)
        }
      }
    }, statsSchema)
    df.withColumn(outCol, statsUdf(col(binCol)))
  }

  /** Deterministic block-patterned BMP (every pixel of block (bx, by)
    * carries `lumas(by * gridW + bx)` on all three channels): the
    * known-structure image for the media near-dup gate — block means
    * recover `lumas` exactly, so near-dup geometry is closed-form. */
  def bmpBlockLuma(w: Int, h: Int, gridW: Int, gridH: Int,
      lumas: Array[Int]): Array[Byte] = {
    require(lumas.length == gridW * gridH && w >= gridW && h >= gridH)
    val out = bmpMedia(w, h, 0L) // header template
    val rowSize = ((3 * w + 3) / 4) * 4
    var y = 0
    while (y < h) {
      val by = y * gridH / h
      val ro = 54 + y * rowSize
      var x = 0
      while (x < w) {
        val v = (lumas(by * gridW + x * gridW / w) max 0 min 255).toByte
        out(ro + 3 * x) = v; out(ro + 3 * x + 1) = v; out(ro + 3 * x + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL model-free image embedding: decode the 24-bit BMP, mean
    * (B+G+R)/3 luma over a gridW×gridH block grid (genuine pixel inner
    * loop, padding-aware), CENTER the block means (subtract the image
    * mean — raw luma vectors are all-positive, which squashes cosine
    * contrast) and unit-normalize. Deterministic, so the downstream
    * LSH/cluster pipeline is value-gateable end-to-end; feeds
    * [[graft.operators.Similarity.selfTopKLsh]] for image near-dup
    * (q_media_semdedup). Non-BMP / corrupt / FLAT (zero-variance —
    * no direction to normalize) images embed to null. Stays a pure
    * column map: embedding 10⁹ images never leaves the executor. */
  def embedImageBlocks(df: DataFrame, binCol: String, gridW: Int = 6,
      gridH: Int = 6, outCol: String = "block_emb",
      avgPayloadBytes: Option[Long] = None): DataFrame = {
    require(gridW > 0 && gridH > 0)
    val dim = gridW * gridH
    val embUdf = udf { (b: Array[Byte]) =>
      parseBmp(b) match {
        case Some((w, h, rowSize, off)) if w >= gridW && h >= gridH =>
          val sums = new Array[Long](dim)
          val counts = new Array[Int](dim)
          var y = 0
          while (y < h) {
            val by = y * gridH / h
            val ro = off + y * rowSize
            var x = 0
            while (x < w) {
              val i = by * gridW + x * gridW / w
              sums(i) += (b(ro + 3 * x) & 0xff) + (b(ro + 3 * x + 1) & 0xff) +
                (b(ro + 3 * x + 2) & 0xff)
              counts(i) += 3
              x += 1
            }
            y += 1
          }
          val means = Array.tabulate(dim)(i => sums(i).toDouble / counts(i))
          val mean = means.sum / dim
          var norm = 0.0
          val centered = means.map { m =>
            val c = m - mean; norm += c * c; c
          }
          if (norm == 0.0) null // flat image: no direction
          else {
            val inv = 1.0 / math.sqrt(norm)
            centered.map(c => (c * inv).toFloat)
          }
        case _ => null
      }
    }
    sizedForMedia(df, avgPayloadBytes).withColumn(outCol, embUdf(col(binCol)))
  }

  /** Feature extraction via mapPartitions — the JVM shape of mapInPandas:
    * per-partition "model" init (the one stub left: no model runtime in
    * this container), then a streamed batch loop over REAL-decoded
    * payloads. Output: (passthrough columns..., embedding array<float>);
    * undecodable payloads embed to null. */
  def embedMedia(df: DataFrame, binCol: String, dim: Int = 16,
      avgPayloadBytes: Option[Long] = None): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add("embedding", ArrayType(FloatType))
    val binIdx = inSchema.fieldIndex(binCol)
    sizedForMedia(df, avgPayloadBytes).mapPartitions { rows =>
      // REAL pipeline: load the vision/audio model once per partition here.
      val model = new StubEncoder(dim)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val emb = if (decode(bytes).isEmpty) null else model.encode(bytes)
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

  /** REAL image resize: decode the 24-bit BMP, nearest-neighbor resample
    * to (targetW, targetH), re-encode with correct row padding. Non-BMP
    * or corrupt input → null, matching the decode contract. Stays a pure
    * column map — resizing 10⁹ images is embarrassingly parallel and
    * must never leave the executor. */
  def resizeMedia(df: DataFrame, binCol: String, outCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0)
    val resizeUdf = udf { (b: Array[Byte]) =>
      parseBmp(b) match {
        case None => null
        case Some((w, h, rowSize, off)) =>
          val out = bmpMedia(targetW, targetH, 0L) // header template
          val outRow = ((3 * targetW + 3) / 4) * 4
          var y = 0
          while (y < targetH) {
            val sy = (y.toLong * h / targetH).toInt
            val sro = off + sy * rowSize
            val dro = 54 + y * outRow
            var x = 0
            while (x < targetW) {
              val sx = (x.toLong * w / targetW).toInt
              out(dro + 3 * x) = b(sro + 3 * sx)
              out(dro + 3 * x + 1) = b(sro + 3 * sx + 1)
              out(dro + 3 * x + 2) = b(sro + 3 * sx + 2)
              x += 1
            }
            y += 1
          }
          out
      }
    }
    df.withColumn(outCol, resizeUdf(col(binCol)))
  }

  /** REAL frame sampling: demux the Y4M container and emit every k-th
    * frame up to `n` rows per video — (frame_idx, frame binary with the
    * raw plane bytes). Non-video rows emit nothing (explode of null).
    * Distributed end-to-end — no driver collect. */
  def sampleFrames(df: DataFrame, binCol: String, n: Int): DataFrame = {
    require(n > 0)
    val sliceUdf = udf { (b: Array[Byte]) =>
      parseY4m(if (b == null) Array.empty[Byte] else b) match {
        case None => null
        case Some((_, _, frameBytes, offs)) =>
          val take = math.min(n, offs.length)
          val step = math.max(offs.length / math.max(take, 1), 1)
          (0 until take).map { k =>
            val fi = math.min(k * step, offs.length - 1)
            (fi, java.util.Arrays.copyOfRange(b, offs(fi), offs(fi) + frameBytes))
          }
      }
    }
    df.withColumn("_frames", sliceUdf(col(binCol)))
      .withColumn("_f", explode(col("_frames")))
      .withColumn("frame_idx", col("_f._1"))
      .withColumn("frame", col("_f._2"))
      .drop("_frames", "_f")
  }

  /** Y4M (C444) with known SCENE structure: `scenes` scenes of
    * `framesPerScene` frames each, every byte of scene s's frames equal
    * to `level(s) & 0xff`. The consecutive-frame mean-abs luma diff is
    * exactly 0 inside a scene and exactly |level(s+1)−level(s)| at each
    * of the `scenes−1` boundaries — closed form for the scene-cut gate. */
  def y4mScenes(w: Int, h: Int, scenes: Int, framesPerScene: Int,
      level: Int => Int): Array[Byte] = {
    require(w > 0 && h > 0 && scenes >= 0 && framesPerScene > 0)
    val header = s"YUV4MPEG2 W$w H$h F25:1 C444\n".getBytes("US-ASCII")
    val frameBytes = w * h * 3
    val fmark = "FRAME\n".getBytes("US-ASCII")
    val frames = scenes * framesPerScene
    val out = new Array[Byte](header.length + frames * (fmark.length + frameBytes))
    System.arraycopy(header, 0, out, 0, header.length)
    var off = header.length
    var f = 0
    while (f < frames) {
      System.arraycopy(fmark, 0, out, off, fmark.length); off += fmark.length
      val v = (level(f / framesPerScene) & 0xff).toByte
      java.util.Arrays.fill(out, off, off + frameBytes, v)
      off += frameBytes; f += 1
    }
    out
  }

  /** REAL scene-cut detection over decoded Y4M frames: the mean absolute
    * luma difference between consecutive frames, a CUT where the exact
    * integer sum Σ|Δ| exceeds `threshold · w · h` (i.e. mean |Δ| >
    * threshold — all-Long arithmetic, no float accumulation, bit-stable).
    * The temporal primitive of video curation: split on cuts, sample one
    * frame per scene, dedup scenes. Luma plane only (the first w·h bytes
    * of both C444 and C420 frames — chroma subsampling never matters).
    * Output struct: n_frames, n_cuts, n_scenes (= cuts+1, or 0 for an
    * empty video). Non-Y4M / corrupt → null, never a task failure. */
  def videoScenes(df: DataFrame, binCol: String, outCol: String = "scenes",
      threshold: Int = 16): DataFrame = {
    require(threshold >= 0)
    val schema = StructType(Seq(
      StructField("n_frames", LongType), StructField("n_cuts", LongType),
      StructField("n_scenes", LongType)))
    val scenesUdf = udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
      override def call(b: Array[Byte]): Row = {
        if (b == null) return null
        parseY4m(b) match {
          case None => null
          case Some((w, h, _, offs)) =>
            val plane = w * h
            var cuts = 0L
            var f = 1
            while (f < offs.length) {
              var sum = 0L
              var i = 0
              val p = offs(f - 1); val c = offs(f)
              while (i < plane) {
                val d = (b(c + i) & 0xff) - (b(p + i) & 0xff)
                sum += (if (d < 0) -d else d)
                i += 1
              }
              if (sum > threshold.toLong * plane) cuts += 1
              f += 1
            }
            val scenes = if (offs.length == 0) 0L else cuts + 1L
            Row(offs.length.toLong, cuts, scenes)
        }
      }
    }, schema)
    df.withColumn(outCol, scenesUdf(col(binCol)))
  }

  /** Per-frame content fingerprints of a Y4M video: the md5 hex of every
    * frame's raw bytes, in frame order — the unit of frame-level video
    * COPY detection (re-uploads, clipped compilations share frames even
    * when metadata and length differ). Downstream, the space-joined
    * fingerprint sequence is a "document" the TEXT dedup machinery
    * ingests unchanged: frame-set Jaccard via minhash bands, exact
    * verification, connected components — no video-specific similarity
    * engine needed. Non-video / corrupt → null. */
  def frameHashes(df: DataFrame, binCol: String,
      outCol: String = "frame_hashes"): DataFrame = {
    val hashUdf = udf { (b: Array[Byte]) =>
      if (b == null) null
      else parseY4mFrames(b) match {
        case None => null
        case Some((frameBytes, offs)) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          offs.map { o =>
            md.reset()
            md.update(b, o, frameBytes)
            md.digest().map(x => f"$x%02x").mkString
          }.toSeq
      }
    }
    df.withColumn(outCol, hashUdf(col(binCol)))
  }

  /** [[parseY4m]] companion exposing (frameBytes, offsets) for byte-range
    * consumers. */
  private def parseY4mFrames(b: Array[Byte]): Option[(Int, Array[Int])] =
    parseY4m(b).map { case (_, _, frameBytes, offs) => (frameBytes, offs) }

  /** Y4M (C444) whose every frame is a gridW×gridH BLOCK-pattern luma
    * image — the video analog of [[bmpBlockLuma]]: frame f's Y plane
    * holds block b at `luma(f, b)` (clamped to 0..255), chroma planes
    * constant 128 (grey). Known-structure video for the TRANSCODE-robust
    * near-dup gate: a "re-encode" jitters every block of every frame by
    * a few levels, which changes every frame's bytes (and so every
    * [[frameHashes]] md5) while barely moving the per-frame block-mean
    * embedding. */
  def y4mBlockLuma(w: Int, h: Int, gridW: Int, gridH: Int, nFrames: Int,
      luma: (Int, Int) => Int): Array[Byte] = {
    require(w >= gridW && h >= gridH && gridW > 0 && gridH > 0 && nFrames >= 0)
    val header = s"YUV4MPEG2 W$w H$h F25:1 C444\n".getBytes("US-ASCII")
    val frameBytes = w * h * 3
    val fmark = "FRAME\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + nFrames * (fmark.length + frameBytes))
    System.arraycopy(header, 0, out, 0, header.length)
    var off = header.length
    var f = 0
    while (f < nFrames) {
      System.arraycopy(fmark, 0, out, off, fmark.length); off += fmark.length
      var y = 0
      while (y < h) {
        val by = y * gridH / h
        var x = 0
        while (x < w) {
          out(off + y * w + x) =
            (luma(f, by * gridW + x * gridW / w) max 0 min 255).toByte
          x += 1
        }
        y += 1
      }
      java.util.Arrays.fill(out, off + w * h, off + frameBytes, 128.toByte)
      off += frameBytes; f += 1
    }
    out
  }

  /** Per-frame block-mean luma embeddings of a Y4M video — the
    * TRANSCODE-ROBUST video fingerprint. [[frameHashes]] is COPY
    * detection: one luma level shift anywhere changes a frame's md5, so
    * a re-encoded upload shares NO hashes with its source and escapes;
    * block-mean embeddings move only ~the jitter amplitude and stay
    * above any reasonable cosine threshold.
    *
    * For every `frameStep`-th frame: mean luma over a gridW×gridH block
    * grid of the Y plane (exact integer sums; both C444 and C420 carry
    * the full-resolution Y plane first, so chroma subsampling never
    * matters), centered and unit-normalized with exactly the
    * [[embedImageBlocks]] arithmetic — a video frame IS an image here,
    * and the downstream LSH machinery is shared, not duplicated.
    * Output: array of (frame_idx, emb) structs; FLAT frames (zero
    * variance — no direction) are skipped; non-video / corrupt /
    * smaller-than-grid payloads embed to null, never a task failure.
    * `frameStep` is the 100 TB knob: embed cost is frames/frameStep per
    * video, and near-dup recall only needs enough sampled frames to
    * clear the rollup's `minMatchedFrames`. */
  def embedVideoFrameBlocks(df: DataFrame, binCol: String, gridW: Int = 6,
      gridH: Int = 6, frameStep: Int = 1,
      outCol: String = "frame_embs",
      avgPayloadBytes: Option[Long] = None): DataFrame = {
    require(gridW > 0 && gridH > 0 && frameStep > 0)
    val dim = gridW * gridH
    val schema = ArrayType(StructType(Seq(
      StructField("frame_idx", IntegerType),
      StructField("emb", ArrayType(FloatType)))))
    val embUdf = udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Seq[Row]] {
      override def call(b: Array[Byte]): Seq[Row] = {
        if (b == null) return null
        parseY4m(b) match {
          case Some((w, h, _, offs)) if w >= gridW && h >= gridH =>
            val res = scala.collection.mutable.ArrayBuffer.empty[Row]
            var f = 0
            while (f < offs.length) {
              val off = offs(f)
              val sums = new Array[Long](dim)
              val counts = new Array[Int](dim)
              var y = 0
              while (y < h) {
                val by = y * gridH / h
                val ro = off + y * w
                var x = 0
                while (x < w) {
                  val i = by * gridW + x * gridW / w
                  sums(i) += (b(ro + x) & 0xff)
                  counts(i) += 1
                  x += 1
                }
                y += 1
              }
              val means = Array.tabulate(dim)(i => sums(i).toDouble / counts(i))
              val mean = means.sum / dim
              var norm = 0.0
              val centered = means.map { m =>
                val c = m - mean; norm += c * c; c
              }
              if (norm != 0.0) {
                val inv = 1.0 / math.sqrt(norm)
                res += Row(f, centered.map(c => (c * inv).toFloat).toSeq)
              }
              f += frameStep
            }
            res.toSeq
          case _ => null
        }
      }
    }, schema)
    sizedForMedia(df, avgPayloadBytes).withColumn(outCol, embUdf(col(binCol)))
  }

  /** Scene-REPRESENTATIVE frame embeddings of a Y4M video in ONE decode
    * pass — the long-video cost knob of transcode-robust near-dup:
    * a 2-hour upload embeds ~one frame per SCENE instead of 180k
    * frames. Scene cuts use exactly [[videoScenes]]' rule (exact
    * integer Σ|Δluma| over the Y plane, cut when mean |Δ| > threshold
    * — all-Long, bit-stable), and the FIRST frame of every scene
    * embeds with exactly the [[embedVideoFrameBlocks]] arithmetic; both
    * happen in the same frame walk, so detection costs no second
    * decode. Re-encodes preserve scene STRUCTURE (a few-level global
    * jitter moves Σ|Δ| far less than a real cut moves it), so the
    * representative SET is stable across variants.
    *
    * Borderline boundaries degrade by EXACTLY ONE match, never a
    * cascade (spec-proven on a deliberately threshold-straddling
    * construction): downstream matching ([[videoNearDupPairs]]) is
    * CONTENT-keyed — scene embeddings meet in LSH cells by value, and
    * the scene ordinal is only a DISTINCTNESS key inside the packed
    * LSH id, never a join key — so when a boundary sitting at the
    * threshold flips under re-encode jitter, the only loss is the one
    * representative of the merged-away scene (cuts are local to
    * consecutive frames, so no later boundary moves, and every later
    * representative still matches by content under its shifted
    * ordinal). The rep-COUNT variance is what an absolute
    * `minMatchedFrames` mishandles; corpora with borderline cuts
    * should set [[videoNearDupPairs]]' `minMatchedFrac` (threshold
    * adapts to the thinner side's rep count — the
    * q_video_scene_borderline gate runs exactly that shape), or use
    * the frame-level [[embedVideoFrameBlocks]] mode, whose frame
    * indexes are time-stable. Output: array of (scene_idx, frame_idx,
    * emb) structs; flat representative frames are skipped (no
    * direction); non-video / corrupt / smaller-than-grid → null. */
  def embedVideoSceneFrames(df: DataFrame, binCol: String, gridW: Int = 6,
      gridH: Int = 6, threshold: Int = 16,
      outCol: String = "scene_embs",
      avgPayloadBytes: Option[Long] = None): DataFrame = {
    require(gridW > 0 && gridH > 0 && threshold >= 0)
    val dim = gridW * gridH
    val schema = ArrayType(StructType(Seq(
      StructField("scene_idx", IntegerType),
      StructField("frame_idx", IntegerType),
      StructField("emb", ArrayType(FloatType)))))
    val embUdf = udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Seq[Row]] {
      override def call(b: Array[Byte]): Seq[Row] = {
        if (b == null) return null
        parseY4m(b) match {
          case Some((w, h, _, offs)) if w >= gridW && h >= gridH =>
            val plane = w * h
            val res = scala.collection.mutable.ArrayBuffer.empty[Row]
            var scene = -1
            var f = 0
            while (f < offs.length) {
              val isCut =
                if (f == 0) true
                else {
                  var sum = 0L
                  var i = 0
                  val p = offs(f - 1); val c = offs(f)
                  while (i < plane) {
                    val d = (b(c + i) & 0xff) - (b(p + i) & 0xff)
                    sum += (if (d < 0) -d else d)
                    i += 1
                  }
                  sum > threshold.toLong * plane
                }
              if (isCut) {
                scene += 1
                val off = offs(f)
                val sums = new Array[Long](dim)
                val counts = new Array[Int](dim)
                var y = 0
                while (y < h) {
                  val by = y * gridH / h
                  val ro = off + y * w
                  var x = 0
                  while (x < w) {
                    val i = by * gridW + x * gridW / w
                    sums(i) += (b(ro + x) & 0xff)
                    counts(i) += 1
                    x += 1
                  }
                  y += 1
                }
                val means = Array.tabulate(dim)(i => sums(i).toDouble / counts(i))
                val mean = means.sum / dim
                var norm = 0.0
                val centered = means.map { m =>
                  val c = m - mean; norm += c * c; c
                }
                if (norm != 0.0) {
                  val inv = 1.0 / math.sqrt(norm)
                  res += Row(scene, f, centered.map(c => (c * inv).toFloat).toSeq)
                }
              }
              f += 1
            }
            res.toSeq
          case _ => null
        }
      }
    }, schema)
    sizedForMedia(df, avgPayloadBytes).withColumn(outCol, embUdf(col(binCol)))
  }

  /** Video-level near-dup pairs from per-frame embeddings — the
    * transcode-robust composition: frames ride the SAME capped LSH
    * machinery image/audio embeddings do
    * ([[graft.operators.Similarity.selfTopKLsh]]), then frame matches
    * roll up to video pairs by matched-frame count.
    *
    * Input: one row per (video id, frame_idx, embedding). Frame rows
    * pack into one LSH id as `video_id << frameIdxBits | frame_idx` —
    * exact bit algebra (shift/mask recovers both sides), requiring
    * 0 ≤ frame_idx < 2^frameIdxBits and video ids < 2^(63−frameIdxBits);
    * the default 20 bits serves 11-hour videos at 25 fps and 8×10¹²
    * video ids.
    *
    * Output: (id1, id2, n_matched) with id1 < id2; n_matched counts
    * DISTINCT id1-side frames with some partner frame ≥ `tau` in id2,
    * and pairs below the match threshold are dropped — one accidental
    * frame collision can never merge two videos (the separation margin
    * a single whole-video embedding lacks). The threshold is
    * max(`minMatchedFrames`, ceil(`minMatchedFrac` · min(reps(v1),
    * reps(v2)))): the absolute floor guards against collision merges,
    * and the RELATIVE part (when frac > 0) adapts to each pair's
    * thinner side — the scene-sampled mode's rep count varies when a
    * borderline boundary flips under re-encode (one rep per flip), and
    * a fixed absolute count would punish exactly the pairs the flip
    * touched. frac = 0 (default) keeps the historical absolute-only
    * semantics and skips the rep-count join entirely. Candidate volume
    * is bounded
    * by maxCell/hotWindow exactly like the image pipeline; a hot cell
    * of replica frames chains by packed id (= video id order), and
    * since replicas co-cell for EVERY sampled frame the same chain
    * neighbors match on all of them — video-level connectivity survives
    * the cap with per-cell cost O(m·hotWindow). */
  def videoNearDupPairs(frames: DataFrame, idCol: String,
      frameIdxCol: String, embCol: String, bits: Int, tables: Int = 8,
      dim: Int = 36, tau: Double = 0.9, minMatchedFrames: Int = 3,
      maxCell: Int = 48, hotWindow: Int = 8,
      frameIdxBits: Int = 20, minMatchedFrac: Double = 0.0,
      nRowsHint: Long = 0L): DataFrame =
    videoNearDupPairsScoped(frames, idCol, frameIdxCol, embCol, bits,
      tables, dim, tau, minMatchedFrames, maxCell, hotWindow,
      frameIdxBits, minMatchedFrac, nRowsHint).df

  /** [[videoNearDupPairs]] with the packed-frame checkpoint's storage
    * lifecycle in the caller's hands (the [[Dedup.Scoped]] contract:
    * consume `df`, then `release()`). The plain overload discards the
    * release — fine for harness sessions that sweep persistent RDDs
    * between queries, a per-call leak of one embeddings copy for a
    * daemonized pipeline calling this operator per batch (ADVICE r15):
    * such callers use THIS variant. */
  def videoNearDupPairsScoped(frames: DataFrame, idCol: String,
      frameIdxCol: String, embCol: String, bits: Int, tables: Int = 8,
      dim: Int = 36, tau: Double = 0.9, minMatchedFrames: Int = 3,
      maxCell: Int = 48, hotWindow: Int = 8,
      frameIdxBits: Int = 20, minMatchedFrac: Double = 0.0,
      nRowsHint: Long = 0L): Dedup.Scoped = {
    require(frameIdxBits > 0 && frameIdxBits < 40 && minMatchedFrames > 0)
    require(minMatchedFrac >= 0.0 && minMatchedFrac <= 1.0)
    // explicit range guards on BOTH packed fields: a frame index past
    // 2^frameIdxBits−1 would bleed into the video id, and a negative or
    // ≥2^(63−frameIdxBits) video id overflows the shiftleft — either
    // silently corrupts the packed key and produces WRONG pair rollups
    // rather than an error. Out-of-range rows are dropped here —
    // visibly, by contract: an >11 h upload's tail frames (at the
    // default 20 bits / 25 fps) stop participating in candidates; raise
    // frameIdxBits for archival footage, and re-key ids below 2^43 if a
    // catalog hands out wider ones
    val packedRaw = frames
      .where(col(frameIdxCol) >= 0 &&
        col(frameIdxCol) < (1L << frameIdxBits) &&
        col(idCol) >= 0 &&
        col(idCol) < (1L << (63 - frameIdxBits)))
      .select(
        (shiftleft(col(idCol).cast(LongType), frameIdxBits) +
          col(frameIdxCol).cast(LongType)).as("fid"),
        col(embCol).as("femb"))
    // The LSH consumes the packed frame table THREE times (cell
    // explode + the two vector re-attach joins; selfTopKLsh's plan
    // subtrees differ, so exchange reuse cannot deduplicate them) and
    // frac mode adds a fourth read (per-video rep counts) — and
    // `frames` typically sits downstream of the decode+embed UDF, the
    // dominant cost of these pipelines. Materialize the post-guard
    // embeddings ONCE (eager localCheckpoint — the
    // [[graft.operators.Dedup.checkpointTracked]] adjudication; blocks
    // are tiny, dim floats per frame, and live until the session sweeps
    // persistent RDDs like the other convenience overloads), so the
    // decode runs once in EVERY mode (round 15: absolute mode ran it
    // 3× — guide §8's "decide with small rows" applied to the decode).
    // The release threads out through the returned Scoped (round 16).
    val (packed, release) = Dedup.checkpointTracked(packedRaw)
    val fp = Similarity.selfTopKLsh(packed, "femb", "fid",
      k = Int.MaxValue, bits = bits, tables = tables, dim = dim,
      maxCell = maxCell, hotWindow = hotWindow, nRowsHint = nRowsHint)
      .where(col("score") >= tau)
    // selfTopKLsh mirrors every pair, so keeping v1 < v2 sees each
    // undirected frame match exactly once, with f1 on the smaller video
    val v = fp.select(
      shiftright(col("id1"), frameIdxBits).as("v1"),
      col("id1").bitwiseAND(lit((1L << frameIdxBits) - 1)).as("f1"),
      shiftright(col("id2"), frameIdxBits).as("v2"))
      .where(col("v1") < col("v2"))
    val rolled = v.groupBy(col("v1").as("id1"), col("v2").as("id2"))
      .agg(countDistinct(col("f1")).as("n_matched"))
    val out =
      if (minMatchedFrac <= 0.0)
        rolled.where(col("n_matched") >= minMatchedFrames)
      else {
        // per-video rep counts over the SAME guarded frame set the LSH
        // saw; SHUFFLE_HASH pinned — the counts derive from the big frame
        // table, whose garbage-small upstream estimate is exactly what
        // static-broadcast misplans feed on (the selfTopKLsh re-attach
        // lesson)
        val reps = packed
          .select(shiftright(col("fid"), frameIdxBits).as("vid"))
          .groupBy("vid").agg(count(lit(1)).as("n_reps"))
        rolled
          .join(reps.select(col("vid").as("id1"), col("n_reps").as("n1"))
            .hint("shuffle_hash"), "id1")
          .join(reps.select(col("vid").as("id2"), col("n_reps").as("n2"))
            .hint("shuffle_hash"), "id2")
          .where(col("n_matched") >= greatest(lit(minMatchedFrames.toLong),
            ceil(least(col("n1"), col("n2")) * lit(minMatchedFrac))))
          .select("id1", "id2", "n_matched")
      }
    Dedup.Scoped(out, release)
  }

  /** Mono 16-bit PCM square-wave WAV with a silent tail: `nTone` samples
    * alternating ±`amp` every `period/2` samples, then `nSilent` zero
    * samples. The known-structure audio for the audio-stats value gate —
    * peak is exactly `amp`, the energy sum is exactly `amp² · nTone`,
    * and full silent windows are exactly `nSilent / window` when both
    * segment lengths are window-aligned (all integer, SQL-replayable). */
  def wavTone(sampleRate: Int, nTone: Int, nSilent: Int, amp: Int,
      period: Int = 8): Array[Byte] = {
    require(amp >= 0 && amp <= 32767 && period >= 2)
    val n = nTone + nSilent
    val dataBytes = n * 2
    val out = new Array[Byte](44 + dataBytes)
    text(out, 0, "RIFF"); leInt(out, 4, 36 + dataBytes); text(out, 8, "WAVE")
    text(out, 12, "fmt "); leInt(out, 16, 16)
    leShort(out, 20, 1); leShort(out, 22, 1); leInt(out, 24, sampleRate)
    leInt(out, 28, sampleRate * 2); leShort(out, 32, 2); leShort(out, 34, 16)
    text(out, 36, "data"); leInt(out, 40, dataBytes)
    var i = 0
    while (i < nTone) {
      val v = if ((i % period) < period / 2) amp else -amp
      leShort(out, 44 + 2 * i, v)
      i += 1
    }
    out
  }

  /** REAL audio analysis (PCM WAV only): a genuine int16 sample loop
    * computing frame count, peak amplitude, the exact Long energy sum
    * (Σ s² — 16-bit samples keep it exact far past 100 TB of audio; no
    * float accumulation, so values are bit-stable across partitionings)
    * and the count of FULL non-overlapping `windowSamples`-frame windows
    * whose peak stays under `silenceThreshold` — the silence-detection
    * primitive of an audio-curation pipeline (trim silence, drop dead
    * recordings). Multi-channel frames take the max |s| across channels.
    * Non-WAV / corrupt / truncated media → null struct, never a task
    * failure (the decode-to-null contract above). */
  def audioStats(df: DataFrame, binCol: String, outCol: String = "audio",
      windowSamples: Int = 256, silenceThreshold: Int = 8): DataFrame = {
    require(windowSamples > 0 && silenceThreshold >= 0)
    val schema = StructType(Seq(
      StructField("n_frames", LongType), StructField("peak_abs", IntegerType),
      StructField("energy", LongType), StructField("silent_windows", LongType)))
    val statsUdf = udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
      override def call(b: Array[Byte]): Row = {
        if (b == null) return null
        parseWavFrames(b) match {
          case None => null
          case Some((ch, dataOff, dataBytes)) =>
            val frames = dataBytes / (2 * ch)
            var peak = 0
            var energy = 0L
            var silent = 0L
            var winPeak = 0
            var f = 0
            while (f < frames) {
              var frameMax = 0
              var c = 0
              while (c < ch) {
                val s = leShortSignedAt(b, dataOff + 2 * (f * ch + c))
                val a = if (s < 0) -s else s
                energy += s.toLong * s
                if (a > frameMax) frameMax = a
                c += 1
              }
              if (frameMax > peak) peak = frameMax
              if (frameMax > winPeak) winPeak = frameMax
              if ((f + 1) % windowSamples == 0) {
                if (winPeak < silenceThreshold) silent += 1
                winPeak = 0
              }
              f += 1
            }
            Row(frames.toLong, peak, energy, silent)
        }
      }
    }, schema)
    df.withColumn(outCol, statsUdf(col(binCol)))
  }

  /** Mono 16-bit PCM WAV whose frames are consecutive square-wave
    * windows at per-window amplitudes `amps` — `samplesPerWindow` frames
    * each. The per-window mean |sample| is exactly `amps(w)`, so
    * [[embedAudioWindows]]'s vector is the (centered, normalized) amp
    * pattern in closed form — the audio analog of [[bmpBlockLuma]]. */
  def wavWindows(samplesPerWindow: Int, amps: Array[Int],
      period: Int = 8): Array[Byte] = {
    require(samplesPerWindow > 0 && period >= 2)
    require(amps.forall(a => a >= 0 && a <= 32767))
    val n = samplesPerWindow * amps.length
    val dataBytes = n * 2
    val out = new Array[Byte](44 + dataBytes)
    text(out, 0, "RIFF"); leInt(out, 4, 36 + dataBytes); text(out, 8, "WAVE")
    text(out, 12, "fmt "); leInt(out, 16, 16)
    leShort(out, 20, 1); leShort(out, 22, 1); leInt(out, 24, 8000)
    leInt(out, 28, 16000); leShort(out, 32, 2); leShort(out, 34, 16)
    text(out, 36, "data"); leInt(out, 40, dataBytes)
    var i = 0
    while (i < n) {
      val a = amps(i / samplesPerWindow)
      leShort(out, 44 + 2 * i, if ((i % period) < period / 2) a else -a)
      i += 1
    }
    out
  }

  /** Energy-envelope embedding of PCM audio — the audio analog of
    * [[embedImageBlocks]]: the frame range splits into `nWin` windows,
    * each contributing its mean |sample| (exact integer sums over int16,
    * all channels pooled), then the vector is centered and
    * unit-normalized so cosine compares envelope SHAPE irrespective of
    * gain. Non-audio / corrupt / shorter-than-nWin / flat (DC) payloads
    * embed to null. Feeds the same capped LSH near-dup pipeline text and
    * image embeddings ride ([[graft.operators.Similarity.selfTopKLsh]]). */
  def embedAudioWindows(df: DataFrame, binCol: String, nWin: Int = 16,
      outCol: String = "win_emb",
      avgPayloadBytes: Option[Long] = None): DataFrame = {
    require(nWin > 0)
    val embUdf = udf { (b: Array[Byte]) =>
      parseWavFrames(b) match {
        case Some((ch, dataOff, dataBytes)) if dataBytes / (2 * ch) >= nWin =>
          val frames = dataBytes / (2 * ch)
          val sums = new Array[Long](nWin)
          val counts = new Array[Int](nWin)
          var f = 0
          while (f < frames) {
            // Long product: f*nWin overflows Int past ~134M frames (>268 MB
            // mono PCM), which would index negatively and kill the task —
            // large-but-valid media must embed, not fail.
            val w = (f.toLong * nWin / frames).toInt
            var c = 0
            while (c < ch) {
              val s = leShortSignedAt(b, dataOff + 2 * (f * ch + c))
              sums(w) += (if (s < 0) -s else s)
              counts(w) += 1
              c += 1
            }
            f += 1
          }
          val means = Array.tabulate(nWin)(i => sums(i).toDouble / counts(i))
          val mean = means.sum / nWin
          var norm = 0.0
          val centered = means.map { m =>
            val c = m - mean; norm += c * c; c
          }
          if (norm == 0.0) null // flat envelope: no direction
          else {
            val inv = 1.0 / math.sqrt(norm)
            centered.map(c => (c * inv).toFloat)
          }
        case _ => null
      }
    }
    sizedForMedia(df, avgPayloadBytes).withColumn(outCol, embUdf(col(binCol)))
  }

  /** [[parseWav]] variant exposing the data-chunk location for sample
    * access: (channels, dataOffset, dataBytes). Same RIFF walk (Long
    * offsets), same null contract. */
  private def parseWavFrames(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var off = 12L
    var ch: Option[Int] = None
    var data: Option[(Int, Int)] = None
    while (off + 8 <= b.length && (ch.isEmpty || data.isEmpty)) {
      val o = off.toInt
      val size = leIntAt(b, o + 4)
      if (size < 0) return None
      val id = new String(b, o, 4, "US-ASCII")
      if (id == "fmt ") {
        if (o + 8 + 16 > b.length || size < 16) return None
        if (leShortAt(b, o + 8) != 1) return None // PCM only
        if (leShortAt(b, o + 22) != 16) return None // 16-bit only
        ch = Some(leShortAt(b, o + 10))
      } else if (id == "data") {
        if (o + 8 + size.toLong > b.length) return None
        data = Some((o + 8, size))
      }
      off += 8L + size.toLong + (size & 1)
    }
    for (c <- ch; (dOff, dBytes) <- data if c > 0) yield (c, dOff, dBytes)
  }

  private def leShortSignedAt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) | (b(off + 1) << 8)).toShort.toInt

  /** Partition sizing for media tables: ~MB payloads want far fewer rows
    * per partition than relational rows — target bytes per task, not row
    * counts. A media table read at relational rows-per-task puts
    * rows×payload bytes in one task's working set (the OOM this guard
    * exists for); every embed entry point takes `avgPayloadBytes` and
    * routes through here. Pass `rowCount` when the caller already knows
    * it (the gates count the pre-decode frame anyway) — otherwise one
    * metadata-cheap count runs here. */
  def repartitionForMedia(df: DataFrame, avgPayloadBytes: Long,
      targetPartitionBytes: Long = 128L << 20,
      rowCount: Option[Long] = None): DataFrame = {
    val rowsPerPartition = math.max(targetPartitionBytes / math.max(avgPayloadBytes, 1), 1)
    val n = math.max((rowCount.getOrElse(df.count()) / rowsPerPartition).toInt, 1)
    df.repartition(n)
  }

  /** [[repartitionForMedia]] applied when the caller supplies a payload
    * hint, identity otherwise — the shared guard of the embed entry
    * points. */
  private def sizedForMedia(df: DataFrame,
      avgPayloadBytes: Option[Long]): DataFrame =
    avgPayloadBytes match {
      case Some(b) => repartitionForMedia(df, b)
      case None    => df
    }
}

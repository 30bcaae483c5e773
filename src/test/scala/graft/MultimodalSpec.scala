package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Real-format multimodal decode (round 11): BMP/WAV/Y4M parsers — header
  * fields, row padding, RIFF chunk walk, frame demux — plus the decode
  * failure contract (truncation / bad magic / lying headers → null
  * column, never a task failure), real resize and real frame sampling. */
class MultimodalSpec extends SparkTestBase {

  private def mediaDf(n: Int) = {
    val rows = (0 until n).map { i =>
      val payload = (i % 3) match {
        case 0 => Multimodal.bmpMedia(10 + i, 6 + i, seed = i.toLong)
        case 1 => Multimodal.wavMedia(8000 + i, 1 + i % 2, 40 + i, seed = i.toLong)
        case _ => Multimodal.y4mMedia(4 + i, 4, 3, seed = i.toLong)
      }
      Row(i.toLong, payload)
    } :+ Row(n.toLong, "not-media".getBytes.asInstanceOf[Array[Byte]]) :+
      Row((n + 1).toLong, null.asInstanceOf[Array[Byte]])
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("id", LongType), StructField("media", BinaryType))))
  }

  test("metadata decode: typed struct per format, corrupt/null -> null meta") {
    val out = Multimodal.withMediaMeta(mediaDf(6), "media").orderBy("id")
    assert(out.schema("meta").dataType === Multimodal.metaSchema)
    val rows = out.collect()
    val good = rows.take(6)
    assert(good.forall(!_.isNullAt(2)))
    // BMP: dims + padded pixel-array size ((3*10+3)/4*4 = 32 per row)
    val m0 = good(0).getStruct(2)
    assert(m0.getString(0) === "image" && m0.getInt(1) === 10 && m0.getInt(2) === 6)
    assert(m0.getInt(3) === 32 * 6)
    // WAV: (sample_rate, channels, data bytes = samples*ch*2)
    val m1 = good(1).getStruct(2)
    assert(m1.getString(0) === "audio" && m1.getInt(1) === 8001 && m1.getInt(2) === 2)
    assert(m1.getInt(3) === 41 * 2 * 2)
    // Y4M: dims + frames * w*h*3 (C444)
    val m2 = good(2).getStruct(2)
    assert(m2.getString(0) === "video" && m2.getInt(1) === 6 && m2.getInt(2) === 4)
    assert(m2.getInt(3) === 3 * 6 * 4 * 3)
    assert(rows.takeRight(2).forall(_.isNullAt(2))) // corrupt + null
  }

  test("byte-level failure modes decode to null, not task failure") {
    val bmp = Multimodal.bmpMedia(12, 8, 7L)
    val wav = Multimodal.wavMedia(8000, 2, 50, 7L)
    val y4m = Multimodal.y4mMedia(6, 4, 2, 7L)
    def truncate(b: Array[Byte], n: Int) = java.util.Arrays.copyOf(b, n)
    val lyingBmp = bmp.clone() // header claims a taller image than the bytes hold
    lyingBmp(22) = 100.toByte
    val lyingWav = wav.clone() // data chunk size beyond the payload
    lyingWav(40) = 0xff.toByte; lyingWav(41) = 0xff.toByte
    val badBppBmp = bmp.clone(); badBppBmp(28) = 8 // unsupported bpp
    val nonPcmWav = wav.clone(); nonPcmWav(20) = 3 // IEEE float fmt
    val shortY4m = truncate(y4m, y4m.length - 5) // truncated last frame
    // top-down BMP (negative biHeight): unsupported variant — the pixel
    // walk assumes bottom-up rows, so this must reject, not emit a
    // silently flipped image
    val topDownBmp = bmp.clone()
    topDownBmp(22) = 0xf8.toByte; topDownBmp(23) = 0xff.toByte
    topDownBmp(24) = 0xff.toByte; topDownBmp(25) = 0xff.toByte
    // a RIFF chunk declaring a size near Int.MaxValue: the chunk walk
    // must step past the buffer in LONG arithmetic and decode to null —
    // Int arithmetic wrapped the offset negative and threw out of the
    // UDF (task failure, not decode-to-null)
    val hugeChunkWav = wav.clone()
    hugeChunkWav(36) = 'J'; hugeChunkWav(37) = 'U'
    hugeChunkWav(38) = 'N'; hugeChunkWav(39) = 'K'
    hugeChunkWav(40) = 0xf0.toByte; hugeChunkWav(41) = 0xff.toByte
    hugeChunkWav(42) = 0xff.toByte; hugeChunkWav(43) = 0x7f.toByte
    val cases: Seq[Array[Byte]] = Seq(
      truncate(bmp, 10), truncate(bmp, 53), truncate(bmp, bmp.length - 1),
      lyingBmp, badBppBmp, topDownBmp,
      truncate(wav, 30), lyingWav, nonPcmWav, hugeChunkWav,
      truncate(y4m, 4), shortY4m,
      Array[Byte](), Array[Byte]('B'))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.zipWithIndex.map {
        case (b, i) => Row(i.toLong, b) }, 2),
      StructType(Seq(StructField("id", LongType), StructField("media", BinaryType))))
    val out = Multimodal.withMediaMeta(df, "media").collect()
    assert(out.forall(_.isNullAt(2)),
      "every malformed payload must decode to null")
    // and the intact originals still decode
    assert(Seq(bmp, wav, y4m).flatMap(b =>
      graft.operators.Multimodal.decode(b)).size === 3)
  }

  test("image stats match a driver-side pixel walk (real decode loop)") {
    val bmp = Multimodal.bmpMedia(9, 5, 42L) // odd width -> padding matters
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, bmp),
        Row(2L, "junk".getBytes.asInstanceOf[Array[Byte]])), 1),
      StructType(Seq(StructField("id", LongType), StructField("media", BinaryType))))
    val out = Multimodal.imageStats(df, "media").orderBy("id").collect()
    // driver reference: walk the same pixel array (rows padded to 4)
    val rowSize = ((3 * 9 + 3) / 4) * 4
    var (sb, sg, sr) = (0L, 0L, 0L)
    for (y <- 0 until 5; x <- 0 until 9) {
      sb += bmp(54 + y * rowSize + 3 * x) & 0xff
      sg += bmp(54 + y * rowSize + 3 * x + 1) & 0xff
      sr += bmp(54 + y * rowSize + 3 * x + 2) & 0xff
    }
    val s = out(0).getAs[Row]("stats")
    assert(s.getDouble(0) === sb.toDouble / 45 && s.getDouble(1) === sg.toDouble / 45 &&
      s.getDouble(2) === sr.toDouble / 45)
    assert(out(1).getAs[Row]("stats") == null, "non-image stats must be null")
  }

  test("mapPartitions embedding: unit-norm float vectors, deterministic, " +
      "null for undecodable payloads") {
    val out = Multimodal.embedMedia(mediaDf(4), "media", dim = 8)
    assert(out.schema("embedding").dataType === ArrayType(FloatType))
    val rows = out.orderBy("id").collect()
    val embs = rows.map(r =>
      Option(r.getAs[scala.collection.Seq[Float]]("embedding")))
    assert(embs.take(4).forall(_.exists(_.length == 8)))
    assert(embs.takeRight(2).forall(_.isEmpty), "corrupt/null embed to null")
    val norm = embs(0).get.map(x => x * x).sum
    assert(math.abs(norm - 1.0) < 1e-3)
    val again = Multimodal.embedMedia(mediaDf(4), "media", dim = 8)
      .orderBy("id").collect().map(r => r.getAs[scala.collection.Seq[Float]]("embedding"))
    assert(again(0) === embs(0).get)
  }

  test("resize: real nearest-neighbor resample, valid BMP out, corners kept") {
    val src = Multimodal.bmpMedia(16, 8, 3L)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, src),
        Row(2L, Multimodal.wavMedia(8000, 1, 10, 1L))), 1),
      StructType(Seq(StructField("id", LongType), StructField("media", BinaryType))))
    val out = Multimodal.withMediaMeta(
      Multimodal.resizeMedia(df, "media", "small", 4, 2), "small")
      .orderBy("id").collect()
    val m = out(0).getAs[Row]("meta")
    assert(m.getString(0) === "image" && m.getInt(1) === 4 && m.getInt(2) === 2)
    // nearest-neighbor maps output (0,0) to source (0,0): bytes agree
    val small = out(0).getAs[Array[Byte]]("small")
    val srcRow = ((3 * 16 + 3) / 4) * 4
    assert(small(54) === src(54) && small(55) === src(55) && small(56) === src(56))
    // and output (x=1,y=1) samples source (x=4,y=4)
    val outRow = ((3 * 4 + 3) / 4) * 4
    assert(small(54 + outRow + 3) === src(54 + 4 * srcRow + 12))
    assert(out(1).getAs[Row]("meta") == null, "audio input resizes to null")
  }

  test("block-mean embedding matches a driver-side pixel walk; flat and " +
      "non-image inputs embed to null") {
    val lumas = Array.tabulate(36)(b => 64 + (b % 3) * 40)
    val bmp = Multimodal.bmpBlockLuma(24, 24, 6, 6, lumas)
    val flat = Multimodal.bmpBlockLuma(12, 12, 6, 6, Array.fill(36)(128))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, bmp), Row(2L, flat),
        Row(3L, "junk".getBytes.asInstanceOf[Array[Byte]])), 1),
      StructType(Seq(StructField("id", LongType), StructField("media", BinaryType))))
    val out = Multimodal.embedImageBlocks(df, "media").orderBy("id").collect()
    val got = out(0).getAs[scala.collection.Seq[Float]]("block_emb")
    // reference: exact block means are the lumas; centered + normalized
    val m = lumas.map(_.toDouble)
    val mean = m.sum / 36
    val c = m.map(_ - mean)
    val inv = 1.0 / math.sqrt(c.map(x => x * x).sum)
    val want = c.map(x => (x * inv).toFloat)
    assert(got.length === 36)
    got.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6f) }
    val embIdx = out(0).fieldIndex("block_emb")
    assert(out(1).isNullAt(embIdx), "flat image has no direction -> null")
    assert(out(2).isNullAt(embIdx), "non-image -> null")
  }

  test("media gate geometry is PROVEN, not sampled: per group, the 8 jitter " +
      "variants' co-cell graph (some table's full 24-plane signature equal) " +
      "is CONNECTED — so the group is one component at any corpus size — " +
      "with cosine separation") {
    def emb(g: Int, r: Int): Array[Double] = {
      val l = Queries.mediaGateLumas(g, r).map(_.toDouble)
      val mean = l.sum / 36
      val c = l.map(_ - mean)
      val inv = 1.0 / math.sqrt(c.map(x => x * x).sum)
      c.map(_ * inv)
    }
    val embs = (0 until 40).map(g => (0 until 8).map(r => emb(g, r)))
    // agreeing on all 24 planes of a table implies co-celling at every
    // bits-prefix lshBitsFor can pick, so connectivity here covers EVERY
    // sf; same-variant members are bit-identical vectors and always
    // co-cell trivially
    val tables = (0 until 8).map(t =>
      graft.functions.Hashing.hyperplanes(24, 36, 42L + t))
    (0 until 40).foreach { g =>
      def sig(t: Int, r: Int): Seq[Boolean] =
        tables(t).map(pl =>
          embs(g)(r).indices.map(i => embs(g)(r)(i) * pl(i)).sum >= 0).toSeq
      // union-find over the 8 variants
      val parent = Array.tabulate(8)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for (t <- tables.indices; r1 <- 0 until 8; r2 <- r1 + 1 until 8)
        if (sig(t, r1) == sig(t, r2)) parent(find(r1)) = find(r2)
      assert((0 until 8).map(find).distinct.size === 1,
        s"group $g's jitter variants don't co-cell in any common table " +
          "chain: the group could split into multiple clusters")
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum // unit vectors
    val inGroupMin = (0 until 40).map { g =>
      (for (r1 <- 0 until 8; r2 <- r1 + 1 until 8)
        yield cos(embs(g)(r1), embs(g)(r2))).min
    }.min
    val crossMax = (for {
      g1 <- 0 until 40; g2 <- g1 + 1 until 40
      r1 <- 0 until 8 by 3; r2 <- 0 until 8 by 3
    } yield cos(embs(g1)(r1), embs(g2)(r2))).max
    assert(inGroupMin > 0.99, s"in-group min cosine $inGroupMin")
    assert(crossMax < 0.85, s"cross-group max cosine $crossMax")
  }

  test("frame sampling demuxes real Y4M frames, non-video emits nothing") {
    val y4m = Multimodal.y4mMedia(4, 4, 6, 9L)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, y4m),
        Row(2L, Multimodal.bmpMedia(4, 4, 1L))), 1),
      StructType(Seq(StructField("id", LongType), StructField("media", BinaryType))))
    val frames = Multimodal.sampleFrames(df, "media", 3)
    val rows = frames.orderBy("frame_idx").collect()
    assert(rows.forall(_.getLong(0) === 1L), "only the video row emits frames")
    assert(rows.length === 3)
    // every-other-frame sampling (6 frames, 3 samples -> step 2)
    assert(rows.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2, 4))
    // each frame is the raw C444 plane: w*h*3 bytes, matching the source
    val frameBytes = 4 * 4 * 3
    assert(rows.forall(_.getAs[Array[Byte]]("frame").length === frameBytes))
    val header = s"YUV4MPEG2 W4 H4 F25:1 C444\n".length
    val f0 = java.util.Arrays.copyOfRange(y4m, header + 6, header + 6 + frameBytes)
    assert(rows(0).getAs[Array[Byte]]("frame").toSeq === f0.toSeq)
  }

  test("audio stats: closed-form square wave + window-aligned silence") {
    import spark.implicits._
    // 512 tone samples at amp 300, then 3 silent windows of 256
    val df = Seq((1L, Multimodal.wavTone(8000, 512, 768, 300)))
      .toDF("doc_id", "media")
    val r = Multimodal.audioStats(df, "media").select("audio.*").collect()(0)
    assert(r.getLong(0) === 1280L, "n_frames")
    assert(r.getInt(1) === 300, "peak")
    assert(r.getLong(2) === 300L * 300L * 512L, "exact energy sum")
    assert(r.getLong(3) === 3L, "silent windows")
  }

  test("audio stats: partial trailing window is not counted as silent") {
    import spark.implicits._
    // 512 tone + 300 silent samples = 1 full silent window + 44 leftover
    val df = Seq((1L, Multimodal.wavTone(8000, 512, 300, 300)))
      .toDF("doc_id", "media")
    val r = Multimodal.audioStats(df, "media").select("audio.*").collect()(0)
    assert(r.getLong(0) === 812L)
    assert(r.getLong(3) === 1L, "only FULL windows count")
  }

  test("audio stats: multi-channel frames take the max across channels, " +
      "non-WAV and corrupt media null out") {
    import spark.implicits._
    val stereo = Multimodal.wavMedia(8000, 2, 64, seed = 7L)
    val bad = stereo.clone(); bad(0) = 'X'
    val df = Seq((1L, stereo), (2L, Multimodal.bmpMedia(4, 4, 1L)),
      (3L, bad), (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "media")
    val rows = Multimodal.audioStats(df, "media")
      .orderBy("doc_id").select("audio").collect()
    val ok = rows(0).getStruct(0)
    assert(ok.getLong(0) === 64L, "frames = samples/channels")
    // driver-side reference walk over the same bytes
    var peak = 0; var energy = 0L
    var i = 0
    while (i < 128) {
      val s = (((stereo(44 + 2 * i) & 0xff) | (stereo(45 + 2 * i) << 8)).toShort).toInt
      energy += s.toLong * s
      val a = math.abs(s); if (a > peak) peak = a
      i += 1
    }
    assert(ok.getInt(1) === peak)
    assert(ok.getLong(2) === energy)
    assert(rows(1).isNullAt(0), "BMP is not audio")
    assert(rows(2).isNullAt(0), "bad magic")
    assert(rows(3).isNullAt(0), "null payload")
  }

  test("audio envelope embedding matches a driver-side reference walk; " +
      "flat and non-audio embed to null") {
    import spark.implicits._
    val amps = Array(100, 500, 300, 900, 100, 500, 300, 900,
      200, 600, 400, 800, 200, 600, 400, 800)
    val wav = Multimodal.wavWindows(32, amps)
    val flat = Multimodal.wavWindows(32, Array.fill(16)(250))
    val df = Seq((1L, wav), (2L, flat), (3L, Multimodal.bmpMedia(4, 4, 1L)))
      .toDF("doc_id", "media")
    val rows = Multimodal.embedAudioWindows(df, "media")
      .orderBy("doc_id").select("win_emb").collect()
    val got = rows(0).getSeq[Float](0)
    // reference: mean |s| per window IS the amp for a square wave
    val m = amps.map(_.toDouble)
    val mean = m.sum / 16
    val c = m.map(_ - mean)
    val inv = 1.0 / math.sqrt(c.map(x => x * x).sum)
    val want = c.map(x => (x * inv).toFloat)
    got.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6f) }
    assert(rows(1).isNullAt(0), "flat envelope has no direction")
    assert(rows(2).isNullAt(0), "BMP is not audio")
  }

  test("video frame embeddings match a driver-side reference walk; " +
      "frameStep samples; flat frames skip; non-video nulls") {
    import spark.implicits._
    // 4 frames: two patterned (from the gate's own construction), one
    // flat (zero variance -> skipped), one more patterned
    val pats = Array(Queries.mediaGateLumas(3, 0), Queries.mediaGateLumas(5, 1),
      Array.fill(36)(77), Queries.mediaGateLumas(9, 2))
    val y4m = Multimodal.y4mBlockLuma(24, 24, 6, 6, 4, (f, b) => pats(f)(b))
    val df = Seq((1L, y4m), (2L, Multimodal.bmpMedia(4, 4, 1L)))
      .toDF("doc_id", "media")
    val rows = Multimodal.embedVideoFrameBlocks(df, "media")
      .orderBy("doc_id").select("frame_embs").collect()
    val fe = rows(0).getSeq[Row](0)
    assert(fe.map(_.getInt(0)) === Seq(0, 1, 3), "flat frame 2 skipped")
    def want(p: Array[Int]): Array[Float] = {
      val m = p.map(_.toDouble)
      val mean = m.sum / 36
      val c = m.map(_ - mean)
      val inv = 1.0 / math.sqrt(c.map(x => x * x).sum)
      c.map(x => (x * inv).toFloat)
    }
    fe.zip(Seq(pats(0), pats(1), pats(3))).foreach { case (row, p) =>
      row.getSeq[Float](1).zip(want(p)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6f) }
    }
    assert(rows(1).isNullAt(0), "BMP is not video")
    // frameStep=2 keeps frames 0 and 2 — and frame 2 is flat, so only 0
    val stepped = Multimodal.embedVideoFrameBlocks(df, "media", frameStep = 2)
      .where($"doc_id" === 1L).select("frame_embs").collect()(0).getSeq[Row](0)
    assert(stepped.map(_.getInt(0)) === Seq(0))
  }

  test("videoNearDupPairs: packing round-trips, matched-frame counting, " +
      "minMatchedFrames filter, id1 < id2") {
    import spark.implicits._
    // unit vectors on distinct axes: frames match iff same axis
    def axis(i: Int): Seq[Float] =
      Seq.tabulate(36)(j => if (j == i) 1.0f else 0.0f)
    // video 1 and 2 share axes on frames 0,1,2 (3 matches); video 3
    // shares only frame 0 with them (1 match)
    val rows = Seq(
      (1L, 0, axis(0)), (1L, 1, axis(1)), (1L, 2, axis(2)),
      (2L, 0, axis(0)), (2L, 1, axis(1)), (2L, 2, axis(2)),
      (3L, 0, axis(0)), (3L, 1, axis(10)), (3L, 2, axis(11)))
      .toDF("vid", "frame_idx", "femb")
    val got = Multimodal.videoNearDupPairs(rows, "vid", "frame_idx", "femb",
      bits = 3, tables = 8, dim = 36, tau = 0.9, minMatchedFrames = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 3L)),
      "only the 3-frame match survives; single-frame collisions filtered")
    val loose = Multimodal.videoNearDupPairs(rows, "vid", "frame_idx", "femb",
      bits = 3, tables = 8, dim = 36, tau = 0.9, minMatchedFrames = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(loose.toSeq === Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("scene-frame embeddings: one decode pass finds videoScenes' exact " +
      "cuts and embeds each scene's FIRST frame; flat reps skip; " +
      "non-video nulls") {
    import spark.implicits._
    // 3 scenes x 2 frames: patterned, flat, patterned — the flat
    // scene's representative has no direction and is skipped while its
    // CUT still advances the scene ordinal
    val pats = Array(Queries.mediaGateLumas(2, 1), Array.fill(36)(200),
      Queries.mediaGateLumas(4, 3))
    val y4m = Multimodal.y4mBlockLuma(24, 24, 6, 6, 6, (f, b) => pats(f / 2)(b))
    val df = Seq((1L, y4m), (2L, Multimodal.bmpMedia(4, 4, 1L)))
      .toDF("doc_id", "media")
    val rows = Multimodal.embedVideoSceneFrames(df, "media")
      .orderBy("doc_id").select("scene_embs").collect()
    val se = rows(0).getSeq[Row](0)
    // scenes 0 and 2 embed (reps at frames 0 and 4); scene 1 is flat
    assert(se.map(r => (r.getInt(0), r.getInt(1))) === Seq((0, 0), (2, 4)))
    def want(p: Array[Int]): Array[Float] = {
      val m = p.map(_.toDouble)
      val mean = m.sum / 36
      val c = m.map(_ - mean)
      val inv = 1.0 / math.sqrt(c.map(x => x * x).sum)
      c.map(x => (x * inv).toFloat)
    }
    se.map(_.getSeq[Float](2)).zip(Seq(pats(0), pats(2))).foreach {
      case (got, p) => got.zip(want(p)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6f) }
    }
    // scene count parity with videoScenes' rule on the same payload
    val vs = Multimodal.videoScenes(df, "media")
      .where($"doc_id" === 1L).select("scenes.n_scenes").collect()(0).getLong(0)
    assert(vs === 3L)
    assert(rows(1).isNullAt(0), "BMP is not video")
  }

  test("scene gate construction is PROVEN: every scene boundary clears " +
      "the cut threshold for every variant (so scene ordinals align " +
      "across re-encodes), and within-scene frames are byte-identical " +
      "by construction") {
    // frames are 24x24 with 4x4-pixel blocks: sum|Δ| = 16 * Σ_b |Δb|;
    // a cut needs sum > threshold(16) * plane(576) ⟺ Σ_b |Δb| > 576
    val nScenes = 6
    for (g <- 0 until 40; r <- 0 until 8; s <- 0 until nScenes - 1) {
      val a = Queries.mediaGateLumas(g * 16 + s, r)
      val b = Queries.mediaGateLumas(g * 16 + s + 1, r)
      val blockDiff = a.indices.map(i => math.abs(a(i) - b(i))).sum
      assert(blockDiff > 576,
        s"group $g variant $r boundary $s: block diff $blockDiff too " +
          "small to register as a scene cut")
    }
  }

  test("video ROBUST gate geometry is PROVEN: per (group, frame), the 8 " +
      "re-encode variants co-cell in some table chain; in-group frames " +
      "match pairwise; NO cross-group video pair reaches minMatchedFrames; " +
      "and variants share ZERO frame hashes (copy detection is blind here)") {
    val nFrames = 6
    def emb(g: Int, f: Int, r: Int): Array[Double] = {
      val l = Queries.mediaGateLumas(g * 16 + f, r).map(_.toDouble)
      val mean = l.sum / 36
      val c = l.map(_ - mean)
      val inv = 1.0 / math.sqrt(c.map(x => x * x).sum)
      c.map(_ * inv)
    }
    val tables = (0 until 8).map(t =>
      graft.functions.Hashing.hyperplanes(24, 36, 42L + t))
    // (a) connectivity: per (g, f) the 8 variants chain through some
    // table's full 24-plane signature — co-celling at every bits prefix
    for (g <- 0 until 40; f <- 0 until nFrames) {
      val es = (0 until 8).map(r => emb(g, f, r))
      def sig(t: Int, r: Int): Seq[Boolean] =
        tables(t).map(pl => es(r).indices.map(i => es(r)(i) * pl(i)).sum >= 0).toSeq
      val parent = Array.tabulate(8)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for (t <- tables.indices; r1 <- 0 until 8; r2 <- r1 + 1 until 8)
        if (sig(t, r1) == sig(t, r2)) parent(find(r1)) = find(r2)
      assert((0 until 8).map(find).distinct.size === 1,
        s"group $g frame $f: re-encode variants don't co-cell")
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    // (b) in-group: every frame of every variant pair matches (≥ τ=0.9)
    // → n_matched = 6 ≥ minMatchedFrames = 4
    val inMin = (for (g <- 0 until 40; f <- 0 until nFrames;
      r1 <- 0 until 8; r2 <- r1 + 1 until 8)
      yield cos(emb(g, f, r1), emb(g, f, r2))).min
    assert(inMin > 0.99, s"in-group same-frame min cosine $inMin")
    // (c) cross-group: for EVERY pair of distinct video classes in
    // different groups, the count of v1 frames with any partner ≥ τ
    // stays below minMatchedFrames=4 — an accidental collision or two
    // can never merge groups
    val classes = for (g <- 0 until 40; r <- 0 until 8)
      yield (g, (0 until nFrames).map(f => emb(g, f, r)))
    var worst = 0
    for (i <- classes.indices; j <- i + 1 until classes.size
        if classes(i)._1 != classes(j)._1) {
      val (a, b) = (classes(i)._2, classes(j)._2)
      var m = 0
      var f1 = 0
      while (f1 < nFrames) {
        var hit = false
        var f2 = 0
        while (f2 < nFrames && !hit) {
          if (cos(a(f1), b(f2)) >= 0.9) hit = true
          f2 += 1
        }
        if (hit) m += 1
        f1 += 1
      }
      if (m > worst) worst = m
    }
    assert(worst < 4, s"cross-group matched-frame count reached $worst")
    // (d) transcode blindness of copy detection: two variants of one
    // group share no frame bytes at all → frame-md5 sets DISJOINT
    def pats(g: Int, r: Int) =
      Array.tabulate(nFrames)(f => Queries.mediaGateLumas(g * 16 + f, r))
    def hashes(r: Int): Set[String] = {
      val p = pats(7, r)
      val y4m = Multimodal.y4mBlockLuma(24, 24, 6, 6, nFrames, (f, b) => p(f)(b))
      import spark.implicits._
      Multimodal.frameHashes(Seq((1L, y4m)).toDF("id", "media"), "media")
        .collect()(0).getSeq[String](2).toSet
    }
    assert((hashes(0) intersect hashes(1)).isEmpty,
      "a re-encode shares no frame hashes — the md5 path cannot see it")
  }

  test("audio gate geometry is PROVEN like the image gate: per group, the " +
      "8 gain-jitter variants co-cell in some table on all 24 planes, " +
      "with cosine separation") {
    def emb(g: Int, r: Int): Array[Double] = {
      val a = Queries.audioGateAmps(g, r).map(_.toDouble)
      val mean = a.sum / 16
      val c = a.map(_ - mean)
      val inv = 1.0 / math.sqrt(c.map(x => x * x).sum)
      c.map(_ * inv)
    }
    val embs = (0 until 40).map(g => (0 until 8).map(r => emb(g, r)))
    val tables = (0 until 8).map(t =>
      graft.functions.Hashing.hyperplanes(24, 16, 42L + t))
    (0 until 40).foreach { g =>
      def sig(t: Int, r: Int): Seq[Boolean] =
        tables(t).map(pl =>
          embs(g)(r).indices.map(i => embs(g)(r)(i) * pl(i)).sum >= 0).toSeq
      val parent = Array.tabulate(8)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for (t <- tables.indices; r1 <- 0 until 8; r2 <- r1 + 1 until 8)
        if (sig(t, r1) == sig(t, r2)) parent(find(r1)) = find(r2)
      assert((0 until 8).map(find).distinct.size === 1,
        s"group $g's gain variants don't co-cell in any common table chain")
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    val inGroupMin = (0 until 40).map { g =>
      (for (r1 <- 0 until 8; r2 <- r1 + 1 until 8)
        yield cos(embs(g)(r1), embs(g)(r2))).min
    }.min
    val crossMax = (for {
      g1 <- 0 until 40; g2 <- g1 + 1 until 40
      r1 <- 0 until 8 by 3; r2 <- 0 until 8 by 3
    } yield cos(embs(g1)(r1), embs(g2)(r2))).max
    assert(inGroupMin > 0.99, s"in-group min cosine $inGroupMin")
    assert(crossMax < 0.85, s"cross-group max cosine $crossMax")
  }

  test("frame hashes: per-frame md5 over real demuxed bytes, non-video null") {
    import spark.implicits._
    val vid = Multimodal.y4mScenes(8, 8, 3, 2, s => 10 + 40 * s)
    val df = Seq((1L, vid), (2L, Multimodal.bmpMedia(4, 4, 1L)))
      .toDF("doc_id", "media")
    val rows = Multimodal.frameHashes(df, "media")
      .orderBy("doc_id").select("frame_hashes").collect()
    val hs = rows(0).getSeq[String](0)
    assert(hs.length === 6, "3 scenes x 2 frames")
    assert(hs(0) === hs(1) && hs(2) === hs(3) && hs(4) === hs(5),
      "constant scenes repeat their frame hash")
    assert(Set(hs(0), hs(2), hs(4)).size === 3, "distinct scene levels differ")
    // driver-side reference: md5 of 8*8*3 bytes of level 10
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest(Array.fill[Byte](192)(10))
      .map(x => f"$x%02x").mkString
    assert(hs(0) === want)
    assert(rows(1).isNullAt(0), "BMP is not video")
  }

  test("video near-dup gate construction is PROVEN: per group, the 8 " +
      "variants' (J >= 0.5 AND band-collision) graph is connected; " +
      "cross-group Jaccard stays under the verify threshold") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def frameHash(level: Int): String =
      md.digest(Array.fill[Byte](192)(level.toByte)).map(x => f"$x%02x").mkString
    def tokens(g: Int, r: Int): Seq[String] =
      (0 until 8).map(sc => frameHash(
        if (sc == r) Queries.videoJitLevel(g, r) else Queries.videoBaseLevel(g, sc)))
    def jac(a: Seq[String], b: Seq[String]): Double = {
      val (sa, sb) = (a.toSet, b.toSet)
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    def sig(g: Int, r: Int): Seq[Long] = {
      val text = tokens(g, r).mkString(" ")
      graft.functions.Hashing.bandKeys(
        graft.functions.Hashing.minhash(text, 1, 32), 16, 2).toSeq
    }
    (0 until 40).foreach { g =>
      val sigs = (0 until 8).map(r => sig(g, r))
      val toks = (0 until 8).map(r => tokens(g, r))
      val parent = Array.tabulate(8)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for (r1 <- 0 until 8; r2 <- r1 + 1 until 8)
        if (jac(toks(r1), toks(r2)) >= 0.5 &&
            sigs(r1).toSet.intersect(sigs(r2).toSet).nonEmpty)
          parent(find(r1)) = find(r2)
      assert((0 until 8).map(find).distinct.size === 1,
        s"group $g variants don't connect through candidate+verify")
    }
    val crossMax = (for {
      g1 <- 0 until 40; g2 <- g1 + 1 until 40
      r1 <- 0 until 8 by 3; r2 <- 0 until 8 by 3
    } yield jac(tokens(g1, r1), tokens(g2, r2))).max
    assert(crossMax < 0.5, s"cross-group J $crossMax reaches the verify bar")
  }

  test("video scene cuts: exact boundaries on known structure, sub-threshold " +
      "diffs ignored, non-video nulls out") {
    import spark.implicits._
    // 3 scenes x 2 frames at levels 10/50/90 (diff 40 > threshold 16)
    val clean = Multimodal.y4mScenes(16, 12, 3, 2, s => 10 + 40 * s)
    // levels 10/18: diff 8 <= 16 -> no cut, one "scene" despite 2 segments
    val subtle = Multimodal.y4mScenes(16, 12, 2, 2, s => 10 + 8 * s)
    val df = Seq((1L, clean), (2L, subtle),
      (3L, Multimodal.bmpMedia(4, 4, 1L))).toDF("doc_id", "media")
    val r = Multimodal.videoScenes(df, "media").orderBy("doc_id")
      .select("scenes").collect()
    val a = r(0).getStruct(0)
    assert(a.getLong(0) === 6L && a.getLong(1) === 2L && a.getLong(2) === 3L)
    val b = r(1).getStruct(0)
    assert(b.getLong(0) === 4L && b.getLong(1) === 0L && b.getLong(2) === 1L,
      "mean diff 8 under threshold 16 is not a cut")
    assert(r(2).isNullAt(0), "BMP is not video")
  }

  test("video scene cuts: threshold is strict mean > t on exact integers") {
    import spark.implicits._
    // diff exactly 16 == threshold -> NOT a cut (sum == t*plane fails >)
    val edge = Multimodal.y4mScenes(8, 8, 2, 1, s => 10 + 16 * s)
    val df = Seq((1L, edge)).toDF("doc_id", "media")
    val r = Multimodal.videoScenes(df, "media").select("scenes.n_cuts").collect()
    assert(r(0).getLong(0) === 0L)
  }

  test("repartitionForMedia + embed entry-point wiring: partition count " +
      "tracks BYTES (rows x payload / target), not row counts") {
    import spark.implicits._
    val rows = (0L until 1000L).map(i => (i, Multimodal.bmpMedia(8, 8, i)))
    val df = rows.toDF("doc_id", "media").repartition(2)
    // 1000 rows x 1 MiB avg at a 128 MiB target -> 128 rows/partition
    // -> 7 partitions (1000/128 floored, min 1)
    val sized = Multimodal.repartitionForMedia(df,
      avgPayloadBytes = 1L << 20, targetPartitionBytes = 128L << 20,
      rowCount = Some(1000L))
    assert(sized.rdd.getNumPartitions === 7)
    // 10x heavier payloads -> ~10x fewer rows per task (128/10 floors
    // to 12 rows/partition -> 83 partitions)
    val heavier = Multimodal.repartitionForMedia(df,
      avgPayloadBytes = 10L << 20, rowCount = Some(1000L))
    assert(heavier.rdd.getNumPartitions === 83)
    // entry-point wiring: the hint resizes the embed input; no hint
    // keeps the caller's partitioning (identity)
    val embedded = Multimodal.embedImageBlocks(df, "media",
      avgPayloadBytes = Some(1L << 20))
    assert(embedded.rdd.getNumPartitions === 7)
    assert(Multimodal.embedImageBlocks(df, "media")
      .rdd.getNumPartitions === 2)
    // EVERY embed entry point routes through the guard (the r14 advice
    // gap: the video/audio points accepted the hint and ignored it)
    assert(Multimodal.embedVideoFrameBlocks(df, "media",
      avgPayloadBytes = Some(1L << 20)).rdd.getNumPartitions === 7)
    assert(Multimodal.embedVideoSceneFrames(df, "media",
      avgPayloadBytes = Some(1L << 20)).rdd.getNumPartitions === 7)
    assert(Multimodal.embedAudioWindows(df, "media",
      avgPayloadBytes = Some(1L << 20)).rdd.getNumPartitions === 7)
    assert(Multimodal.embedVideoFrameBlocks(df, "media")
      .rdd.getNumPartitions === 2)
    assert(Multimodal.embedVideoSceneFrames(df, "media")
      .rdd.getNumPartitions === 2)
    assert(Multimodal.embedAudioWindows(df, "media")
      .rdd.getNumPartitions === 2)
    // and the values are untouched by the exchange (same embeddings)
    val a = Multimodal.embedImageBlocks(df, "media")
      .select("doc_id", "block_emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = embedded.select("doc_id", "block_emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a === b)
  }

  test("BORDERLINE scene boundary: the 2->3 cut flips by variant parity " +
      "(exact integers), costs EXACTLY one representative -- no ordinal " +
      "cascade -- and minMatchedFrac keeps the pair where an absolute " +
      "threshold drops it") {
    import spark.implicits._
    val nScenes = 6
    val fps = 2
    def media(g: Int, r: Int): Array[Byte] = {
      val pats = Array.tabulate(nScenes)(sc => Queries.borderlineSceneLumas(g, sc, r))
      Multimodal.y4mBlockLuma(24, 24, 6, 6, nScenes * fps, (f, b) => pats(f / fps)(b))
    }
    // construction well-formedness for EVERY group and variant: values
    // clamp-free (the delta must survive y4mBlockLuma's 0..255 clamp
    // byte-exact or the flip arithmetic is fiction), >= 2 low and >= 2
    // high base blocks exist, and the engineered boundary sums to
    // EXACTLY 576 (odd r) / 577 (even r) block-levels = 16*576 / 16*577
    // pixel-|delta| against the strict > 16*576 cut rule
    for (g <- 0 until 40; r <- 0 until 8) {
      val p2 = Queries.borderlineSceneLumas(g, 2, r)
      val p3 = Queries.borderlineSceneLumas(g, 3, r)
      assert(p3.forall(v => v >= 0 && v <= 255), s"clamp hit g=$g r=$r")
      val sum = (0 until 36).map(b => math.abs(p3(b) - p2(b))).sum
      assert(sum === (if (r % 2 == 0) 577 else 576), s"g=$g r=$r sum=$sum")
      // non-engineered boundaries + the 3->4 one clear the cut with
      // real margin for every variant (no accidental second flip)
      for (sc <- 0 until nScenes - 1 if sc != 2) {
        val a = Queries.borderlineSceneLumas(g, sc, r)
        val b2 = Queries.borderlineSceneLumas(g, sc + 1, r)
        val s2 = (0 until 36).map(b => math.abs(b2(b) - a(b))).sum
        assert(s2 > 700, s"boundary $sc->${sc + 1} too close: $s2 (g=$g r=$r)")
      }
    }
    // the flip through the REAL decode: even variants detect 6 scenes,
    // odd variants 5 (the merged region's content never embeds)
    val df = (for (r <- 0 until 8) yield (r.toLong, media(7, r)))
      .toDF("doc_id", "media")
    val scenes = Multimodal.embedVideoSceneFrames(df, "media")
    val repCounts = scenes.select(col("doc_id"), size(col("scene_embs")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (r <- 0 until 8)
      assert(repCounts(r.toLong) === (if (r % 2 == 0) 6 else 5),
        s"variant $r rep count ${repCounts(r.toLong)}")
    // scene 3's content is genuinely distinct from scene 2 (below tau):
    // the lost representative is a REAL lost match, not a freebie
    def embOf(l: Array[Int]): Array[Double] = {
      val mean = l.map(_.toDouble).sum / 36
      val c = l.map(_ - mean)
      val inv = 1.0 / math.sqrt(c.map(x => x * x).sum)
      c.map(_ * inv)
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    for (g <- 0 until 40; r <- 0 until 8) {
      val c23 = cos(embOf(Queries.borderlineSceneLumas(g, 2, r)),
        embOf(Queries.borderlineSceneLumas(g, 3, r)))
      assert(c23 < 0.9, s"scene3 must not match scene2: g=$g r=$r cos=$c23")
    }
    // end-to-end pair arithmetic (one even + one odd variant): the
    // match count is nScenes - 1 = 5 -- every later scene still matches
    // by CONTENT under its shifted ordinal (ordinals are distinctness
    // keys only), refuting the cascade story; the absolute threshold 6
    // drops the pair, minMatchedFrac = 0.75 keeps it (ceil(.75*5) = 4)
    val frames = scenes
      .select(col("doc_id"), explode(col("scene_embs")).as("se"))
      .select(col("doc_id"), col("se.scene_idx").as("scene_idx"),
        col("se.emb").as("semb"))
    def pairsWith(minAbs: Int, frac: Double) =
      Multimodal.videoNearDupPairs(frames, "doc_id", "scene_idx", "semb",
        bits = 6, tables = 8, dim = 36, tau = 0.9,
        minMatchedFrames = minAbs, minMatchedFrac = frac)
    val loose = pairsWith(1, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // (0,1): id1 = variant 0 (6 reps), partner variant 1 (5 reps)
    assert(loose((0L, 1L)) === 5L, s"mixed pair matched ${loose((0L, 1L))}")
    assert(loose((1L, 3L)) === 5L) // odd-odd: both 5 reps, all match
    assert(loose((0L, 2L)) === 6L) // even-even: all 6 match
    val strict = pairsWith(6, 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!strict.contains((0L, 1L)),
      "absolute threshold 6 must drop the mixed pair (the demonstrated failure)")
    val adaptive = pairsWith(3, 0.75).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every variant pair survives the adaptive threshold
    val all = (for (a <- 0 until 8; b <- a + 1 until 8) yield (a.toLong, b.toLong)).toSet
    assert(all.subsetOf(adaptive), s"missing: ${all -- adaptive}")
  }

  test("BORDERLINE gate separation is PROVEN: cross-group videos stay " +
      "under the adaptive match threshold for the fixed construction") {
    def embOf(l: Array[Int]): Array[Double] = {
      val mean = l.map(_.toDouble).sum / 36
      val c = l.map(_ - mean)
      val inv = 1.0 / math.sqrt(c.map(x => x * x).sum)
      c.map(_ * inv)
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    // a variant's representative CONTENTS: odd variants never embed
    // scene 3 (merged); even variants embed all 6
    val classes = for (g <- 0 until 40; r <- 0 until 8) yield (g,
      (0 until 6).filter(sc => sc != 3 || r % 2 == 0)
        .map(sc => embOf(Queries.borderlineSceneLumas(g, sc, r))))
    var worst = 0
    for (i <- classes.indices; j <- i + 1 until classes.size
        if classes(i)._1 != classes(j)._1) {
      val (a, b) = (classes(i)._2, classes(j)._2)
      val m = a.count(e1 => b.exists(e2 => cos(e1, e2) >= 0.9))
      if (m > worst) worst = m
    }
    // adaptive threshold floor: max(3, ceil(.75 * min(5, 5))) = 4
    assert(worst < 4, s"cross-group matched-scene count reached $worst")
    // and in-group: same-scene embeddings across all variant pairs
    // match pairwise (>= tau), so every in-group pair reaches its
    // threshold (6<->6: 6 >= 5; any pair touching a 5-rep side: 5 >= 4)
    val inMin = (for (g <- 0 until 40; sc <- 0 until 6;
      r1 <- 0 until 8; r2 <- r1 + 1 until 8)
      yield cos(embOf(Queries.borderlineSceneLumas(g, sc, r1)),
        embOf(Queries.borderlineSceneLumas(g, sc, r2)))).min
    assert(inMin > 0.99, s"in-group same-scene min cosine $inMin")
  }
}

package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkTestBase {

  private def mediaDf(n: Int) = {
    val rows = (0 until n).map { i =>
      Row(i.toLong, Multimodal.fakeMedia(i % 3, 640 + i, 480 + i, seed = i.toLong))
    } :+ Row(n.toLong, "not-media".getBytes.asInstanceOf[Array[Byte]]) :+
      Row((n + 1).toLong, null.asInstanceOf[Array[Byte]])
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("id", LongType), StructField("media", BinaryType))))
  }

  test("metadata decode: typed struct, corrupt/null payloads -> null meta") {
    val out = Multimodal.withMediaMeta(mediaDf(6), "media").orderBy("id")
    assert(out.schema("meta").dataType === Multimodal.metaSchema)
    val rows = out.collect()
    val good = rows.take(6)
    assert(good.forall(!_.isNullAt(2)))
    val m0 = good(0).getStruct(2)
    assert(m0.getString(0) === "image" && m0.getInt(1) === 640 && m0.getInt(2) === 480)
    assert(good(1).getStruct(2).getString(0) === "audio")
    assert(rows.takeRight(2).forall(_.isNullAt(2))) // corrupt + null
  }

  test("mapPartitions embedding: unit-norm float vectors, deterministic") {
    val out = Multimodal.embedMedia(mediaDf(4), "media", dim = 8)
    assert(out.schema("embedding").dataType === ArrayType(FloatType))
    val embs = out.orderBy("id").collect().map(r =>
      Option(r.getAs[scala.collection.Seq[Float]]("embedding")))
    assert(embs.take(4).forall(_.exists(_.length == 8)))
    val norm = embs(0).get.map(x => x * x).sum
    assert(math.abs(norm - 1.0) < 1e-3)
    // deterministic across runs
    val again = Multimodal.embedMedia(mediaDf(4), "media", dim = 8)
      .orderBy("id").collect().map(r => r.getAs[scala.collection.Seq[Float]]("embedding"))
    assert(again(0) === embs(0).get)
  }

  test("resize rewrites dimensions, shrinks payload, nulls corrupt input") {
    val out = Multimodal.withMediaMeta(
      Multimodal.resizeMedia(mediaDf(4), "media", "small", 64, 48), "small")
      .orderBy("id").collect()
    val good = out.take(4)
    good.foreach { r =>
      val m = r.getStruct(r.length - 1)
      assert(m.getInt(1) === 64 && m.getInt(2) === 48)
      assert(m.getInt(3) <= 256) // payload decimated, never grown
    }
    assert(out.takeRight(2).forall(r => r.isNullAt(2))) // corrupt + null in
  }

  test("frame sampling explodes n frames per media row") {
    val df = mediaDf(2).where(col("media").isNotNull).limit(2)
    val frames = Multimodal.sampleFrames(df, "media", 4)
    assert(frames.schema("frame_idx").dataType === IntegerType)
    assert(frames.schema("frame").dataType === BinaryType)
    val byId = frames.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.values.forall(_ === 4))
    // frames reassemble within payload bounds
    val f = frames.where(col("id") === 0).orderBy("frame_idx")
      .select("frame").collect().map(_.getAs[Array[Byte]](0))
    assert(f.map(_.length).sum <= 256 + 16)
  }
}

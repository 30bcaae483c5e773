package graft

import graft.streaming.StreamProtocol
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** `--stream` wire-format codec vs the reference
  * (mydumper_stream.c:55-155, myloader_stream.c:293). */
class StreamProtocolSpec extends SparkTestBase {

  test("wire format: \\n-- name size\\n + raw bytes, exact") {
    val out = new ByteArrayOutputStream()
    StreamProtocol.writeEntry(out, "tpch.region.00000.sql", "INSERT INTO r VALUES (1);\n".getBytes)
    val s = out.toString(StandardCharsets.UTF_8)
    assert(s === "\n-- tpch.region.00000.sql 26\nINSERT INTO r VALUES (1);\n")
  }

  test("payloads containing the boundary marker survive (size-framed, not scanned)") {
    val tricky = "SELECT 1;\n-- tpch.fake.00000.sql 99\nSELECT 2;\n".getBytes
    val out = new ByteArrayOutputStream()
    StreamProtocol.writeEntry(out, "metadata", "# Started dump at: x\n[config]\nquote-character = BACKTICK\n".getBytes)
    StreamProtocol.writeEntry(out, "tpch.t.00000.sql", tricky)
    StreamProtocol.writeEntry(out, "tpch.t-schema.sql", "CREATE TABLE `t` (a int);\n".getBytes)
    val dir = Files.createTempDirectory("graft_stream_")
    val names = StreamProtocol.readAll(new ByteArrayInputStream(out.toByteArray), dir)
    assert(names === Seq("metadata", "tpch.t.00000.sql", "tpch.t-schema.sql"))
    assert(Files.readAllBytes(dir.resolve("tpch.t.00000.sql")) === tricky)
    // arrival order feeds the stream classifier: metadata first, bare
    // `metadata` is PARTIAL in stream mode (process_filename.c:134-140)
    assert(Load.classify(names.head, stream = true) === Load.MetadataPartial)
  }

  test("full dump dir round-trips through the stream") {
    val dir = Files.createTempDirectory("graft_sp_dump_").toString
    Dump.run(spark, Seq(("region", Tables.region(spark, sf), true),
      ("nation", Tables.nation(spark, sf), true)),
      Dump.Config(outDir = dir, db = "tpch"))
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq
    // metadata first like send_initial_metadata, then the rest
    val ordered = files.filter(_.startsWith("metadata")) ++
      files.filterNot(_.startsWith("metadata"))
    val out = new ByteArrayOutputStream()
    StreamProtocol.writeDir(java.nio.file.Paths.get(dir), ordered, out)
    val rx = Files.createTempDirectory("graft_sp_rx_")
    val names = StreamProtocol.readAll(new ByteArrayInputStream(out.toByteArray), rx)
    assert(names === ordered)
    // byte-identical landing
    files.foreach { n =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(java.nio.file.Paths.get(dir, n)),
        Files.readAllBytes(rx.resolve(n))), s"byte mismatch in $n")
    }
    // and the landed dir restores like the original
    val sources = Load.sourcesFromDir(rx.toString)
    assert(sources.map(_.table).sorted === Seq("tpch.nation", "tpch.region"))
    // truncation fails loudly, not silently
    val bytes = out.toByteArray
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 10)
    assertThrows[IllegalArgumentException] {
      StreamProtocol.readAll(new ByteArrayInputStream(cut),
        Files.createTempDirectory("graft_sp_bad_"))
    }
    // path traversal in a crafted stream is rejected
    val evil = new ByteArrayOutputStream()
    evil.write("\n-- ../evil.sql 1\nx".getBytes)
    assertThrows[IllegalArgumentException] {
      StreamProtocol.readAll(new ByteArrayInputStream(evil.toByteArray),
        Files.createTempDirectory("graft_sp_evil_"))
    }
  }
}

package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** The `--stream` wire format (process_stream,
  * mydumper_stream.c:55-155): each completed dump file is sent as
  *
  * {{{ \n-- <basename> <size>\n<raw file bytes> }}}
  *
  * — a newline, `-- `, the file's base name, one space, the byte size
  * in decimal, a newline, then exactly `size` raw bytes. The consumer
  * (myloader_stream.c:293) detects the `\n-- ` boundary and routes
  * each file through the stream classifier (metadata first, schemas,
  * data). Encoding/decoding this exactly makes
  * `mydumper --stream | graft load` (and the reverse) interoperate. */
object StreamProtocol {

  /** Send one file: header + raw bytes. */
  def writeEntry(out: OutputStream, name: String, bytes: Array[Byte]): Unit = {
    out.write('\n')
    out.write("-- ".getBytes(StandardCharsets.UTF_8))
    out.write(name.getBytes(StandardCharsets.UTF_8))
    out.write(' ')
    out.write(bytes.length.toString.getBytes(StandardCharsets.UTF_8))
    out.write('\n')
    out.write(bytes)
  }

  /** Stream a dump directory's files in the order given (the producer
    * streams each file as its writer completes; a whole-directory
    * replay streams metadata first like send_initial_metadata). */
  def writeDir(dir: Path, names: Seq[String], out: OutputStream): Unit = {
    val b = new BufferedOutputStream(out, 1 << 16)
    names.foreach { n =>
      writeEntry(b, n, Files.readAllBytes(dir.resolve(n)))
    }
    b.flush()
  }

  /** Consume a stream into `outDir`, returning file names in arrival
    * order. Sizes are trusted exactly — payload bytes are never
    * scanned for boundaries (a data file may legally contain
    * `\n-- `). */
  def readAll(in: InputStream, outDir: Path): Seq[String] = {
    val bin = new BufferedInputStream(in, 1 << 16)
    val names = Seq.newBuilder[String]
    Files.createDirectories(outDir)
    var c = bin.read()
    while (c >= 0) {
      // skip the inter-entry newline(s); a well-formed stream starts
      // each entry with \n-- but the FIRST entry's leading \n is
      // still present (the producer always writes it)
      if (c == '\n') c = bin.read()
      else if (c == '-') {
        // expect "-- "
        val c2 = bin.read(); val c3 = bin.read()
        require(c2 == '-' && c3 == ' ', "malformed stream header")
        val header = new StringBuilder
        var h = bin.read()
        while (h >= 0 && h != '\n') { header += h.toChar; h = bin.read() }
        val text = header.result()
        val cut = text.lastIndexOf(' ')
        require(cut > 0, s"malformed stream header: -- $text")
        val name = text.substring(0, cut)
        val size = text.substring(cut + 1).toLong
        require(!name.contains('/') && !name.contains(".."),
          s"unsafe stream file name: $name")
        val target = outDir.resolve(name)
        val out = Files.newOutputStream(target)
        try {
          val buf = new Array[Byte](1 << 16)
          var remaining = size
          while (remaining > 0) {
            val n = bin.read(buf, 0, math.min(buf.length, remaining).toInt)
            require(n >= 0, s"stream truncated inside $name ($remaining bytes short)")
            out.write(buf, 0, n)
            remaining -= n
          }
        } finally out.close()
        names += name
        c = bin.read()
      } else throw new IllegalStateException(
        s"unexpected byte ${c.toChar} between stream entries")
    }
    names.result()
  }
}

package graft.operators

import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for large-scale training-data pipelines
  * (north-star extension surface — BASELINE.json `north_star`; absent
  * from the reference, which is text/numeric only).
  *
  * Design: media (image/audio/video) travels as an opaque `binary`
  * payload column plus typed metadata, exactly like a production lakehouse
  * layout (parquet BYTE_ARRAY + struct column). Every operator here is a
  * narrow per-row transform — zero shuffle, trivially partition-parallel,
  * which is the whole scale story for decode/feature pipelines: 100 TB of
  * media shards across executors with no coordination.
  *
  * The actual codec step is STUBBED: this environment ships no image/
  * audio libraries, so [[FakeDecoder]] derives deterministic pseudo-
  * metadata from the payload's md5 (replayable in the DuckDB oracle).
  * The plumbing around it — binary columns, substring frame slicing,
  * per-partition decoder lifecycle via `mapPartitions`, array-typed
  * feature output that feeds straight into [[Similarity]] — is real and
  * tested. A real deployment implements [[BlobDecoder]] over libjpeg/
  * ffmpeg and swaps it into [[decodeWith]]; nothing else changes.
  */
object Multimodal {

  /** The fixture stand-in: treat a text column's UTF-8 bytes as the
    * opaque media payload. */
  def payload(text: Column): Column = text.cast("binary")

  /** Byte length of the payload (Spark `length` on binary counts bytes;
    * DuckDB mirror: `octet_length`). */
  def blobLen(p: Column): Column = length(p)

  /** Content address of the payload — dedup/lineage key for media. */
  def blobMd5(p: Column): Column = md5(p)

  /** 60-bit hash of the payload salted with a field tag — the shared
    * Spark/DuckDB trick for deterministic pseudo-decode: both engines
    * compute `md5(hex(payload) || tag)` and read the first 15 hex digits
    * as a long. */
  private def saltedHash(p: Column, tag: String): Column =
    conv(substring(md5(concat(hex(p), lit(tag))), 1, 15), 16, 10).cast("long")

  /** STUB image decode: deterministic pseudo-metadata (width 64-1343,
    * height 64-783, channels 1-3) derived from the payload hash. Stands
    * in for a real header parse; see [[BlobDecoder]] for the real hook. */
  def fakeImageMeta(p: Column): Column = struct(
    (pmod(saltedHash(p, "-w"), lit(1280)) + 64).cast("int").as("width"),
    (pmod(saltedHash(p, "-h"), lit(720)) + 64).cast("int").as("height"),
    (pmod(saltedHash(p, "-c"), lit(3)) + 1).cast("int").as("channels"))

  /** STUB feature extraction: a dim-length pseudo-embedding in [-1, 1],
    * feature i = (saltedHash(p, "-f<i>") % 2001 - 1000) / 1000. Fake
    * values, real plumbing — the output is `array<double>` and feeds
    * [[Similarity.cosineTopK]] / [[Dedup]] unchanged. */
  def fakeFeatures(p: Column, dim: Int = 8): Column =
    array((0 until dim).map { i =>
      ((pmod(saltedHash(p, s"-f$i"), lit(2001)) - 1000).cast("double")
        / 1000.0).as(s"f$i")
    }: _*)

  /** Frame sampling: ALWAYS returns exactly `nFrames` entries of
    * `struct<frame_idx:int, frame_md5:string>`, slicing
    * `floor(len/nFrames)`-byte windows from the front of the payload (a
    * video keyframe / audio window stand-in; `posexplode`-ready).
    * Contract notes: this is SAMPLING, not coverage — up to nFrames-1
    * tail bytes fall outside every slice; and payloads shorter than
    * nFrames produce trailing empty slices (md5 of zero bytes,
    * d41d8cd9...), which callers doing dedup/lineage on frame hashes
    * should filter. Slicing is real substring-on-binary; only the
    * downstream decode is fake. */
  def frameSamples(p: Column, nFrames: Int = 4): Column = {
    // floor() before the int cast: Spark's double→int cast truncates but
    // DuckDB's rounds, so the shared SQL must make the floor explicit.
    val flen = greatest(lit(1), floor(blobLen(p) / nFrames).cast("int"))
    array((0 until nFrames).map { j =>
      struct(lit(j).as("frame_idx"),
        md5(p.substr(lit(j) * flen + 1, flen)).as("frame_md5"))
    }: _*)
  }

  /** Resize planning on decoded metadata: cap the longer edge at
    * `maxEdge`, preserving aspect ratio with floor semantics, and report
    * the output byte budget (w·h·channels, a raw-bitmap stand-in). Pure
    * arithmetic on the metadata struct — the actual pixel resample lives
    * behind [[BlobDecoder]] like every other real codec step; THIS step
    * is what a planner needs to budget shuffle/storage before decoding
    * anything. floor() is explicit so Spark and DuckDB agree (their
    * double→int casts round differently); products stay ≤ ~2^21, exact
    * in doubles. */
  def resizeMeta(meta: Column, maxEdge: Int): Column = {
    val w = meta.getField("width").cast("long")
    val h = meta.getField("height").cast("long")
    val c = meta.getField("channels").cast("long")
    val g = greatest(w, h)
    val nw = when(g <= maxEdge, w)
      .otherwise(greatest(lit(1L), floor(w * maxEdge / g).cast("long")))
    val nh = when(g <= maxEdge, h)
      .otherwise(greatest(lit(1L), floor(h * maxEdge / g).cast("long")))
    struct(nw.as("new_w"), nh.as("new_h"),
      (nw * nh * c).as("out_bytes"))
  }

  // --- pluggable real-decoder hook --------------------------------------

  /** Decoded media metadata (the real schema would add duration, codec,
    * bitrate, ...). */
  case class DecodedMeta(width: Int, height: Int, channels: Int)

  /** A blob with identity — input record for batch decode. */
  case class Blob(id: Long, bytes: Array[Byte])

  /** Decoded record. */
  case class Decoded(id: Long, meta: DecodedMeta)

  /** The real-decoder extension point. Implementations wrap a native
    * codec (libjpeg, ffmpeg, ...); instances are created once per
    * partition by [[decodeWith]] — the standard lifecycle for decoders
    * with expensive init (dictionary load, JNI handle). */
  trait BlobDecoder extends Serializable {
    def open(): Unit = ()
    def decode(bytes: Array[Byte]): DecodedMeta
    def close(): Unit = ()
  }

  /** Deterministic stand-in decoder: same math as [[fakeImageMeta]],
    * computed JVM-side. */
  object FakeDecoder extends BlobDecoder {
    private def salted(bytes: Array[Byte], tag: String): Long = {
      val hexs = bytes.map(b => f"${b & 0xff}%02X").mkString
      val md = java.security.MessageDigest.getInstance("MD5")
      val dig = md.digest((hexs + tag).getBytes("UTF-8"))
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
      (h << 4) | ((dig(7) >> 4) & 0xfL)
    }
    def decode(bytes: Array[Byte]): DecodedMeta = DecodedMeta(
      width = (Math.floorMod(salted(bytes, "-w"), 1280L) + 64).toInt,
      height = (Math.floorMod(salted(bytes, "-h"), 720L) + 64).toInt,
      channels = (Math.floorMod(salted(bytes, "-c"), 3L) + 1).toInt)
  }

  /** Synthesize a REAL Windows-BMP blob (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, little-endian per the public BMP layout) whose
    * dimensions are the same md5-derived values as [[FakeDecoder]] —
    * so the DuckDB oracle can still predict width/height/channels from
    * the source text, while the Spark side must RECOVER them from the
    * byte layout ([[BmpDecoder]]). Header-complete, pixel-truncated:
    * the declared sizes are spec-honest (4-byte-aligned rows) but the
    * pixel array is the text bytes as a stand-in — metadata decode
    * never touches pixels, and a full pixel array (w·h·c up to ~2.8 MB
    * per blob) would be fixture bloat, not fidelity. */
  def bmpBlob(textBytes: Array[Byte]): Array[Byte] = {
    val meta = FakeDecoder.decode(textBytes)
    bmpBlobFromMeta(textBytes, meta.width, meta.height, meta.channels)
  }

  /** Header write alone, given precomputed dims — the cheap half of
    * [[bmpBlob]]. Split out so the expensive half (three md5-over-hex
    * derivations) can run inside whole-stage codegen via
    * [[fakeImageMeta]] instead of per-row JVM string building
    * (round-9 perf fix: the fused JVM path cost ~2.4 s/key at sf0.1;
    * columnar meta + this O(len) copy is ~10×  cheaper). */
  def bmpBlobFromMeta(pixels: Array[Byte], width: Int, height: Int,
                      channels: Int): Array[Byte] = {
    // Long arithmetic end-to-end: Int rowSize math could itself wrap
    // (width*channels*8 at width ~2^27) and sneak a negative size past
    // the guard below (round-9 review finding)
    val rowSize = ((width.toLong * channels * 8 + 31) / 32) * 4
    val imgSize = rowSize * height
    // the declared-size fields are int32 in the BMP layout; reject dims
    // whose raw bitmap would wrap them rather than write a corrupt
    // header (md5-derived fixture dims are <= 1344x784, far inside)
    require(imgSize >= 0 && imgSize <= Int.MaxValue - 54,
      s"BMP raw size $imgSize overflows the int32 header fields " +
        s"($width x $height x $channels)")
    val bb = java.nio.ByteBuffer.allocate(54 + pixels.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // Declared file size = the ACTUAL blob length: the fixture stores a
    // truncated pixel payload (the gate's blobs carry the md5 payload,
    // not w*h*c raw bytes), and a header claiming 54+imgSize would make
    // the file read as corrupt to any external/stricter tool even
    // though BmpDecoder only reads dims (round-9 ADVICE). The raw
    // bitmap size field (biSizeImage) below stays LAYOUT-true at
    // w*h*c BY DESIGN — intentionally inconsistent with bfSize for
    // truncated fixtures: it is the field the decoder's dim/geometry
    // parse exercises, and clamping it to pixels.length would break
    // the w×h×c invariant the meta keys assert (round-10 ADVICE:
    // a strict external reader may reject the blob on this field;
    // these blobs are test fixtures, not export artifacts).
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(54 + pixels.length)            // declared file size
      .putInt(0)                             // reserved
      .putInt(54)                            // pixel-data offset
      .putInt(40)                            // BITMAPINFOHEADER size
      .putInt(width)
      .putInt(height)                        // positive = bottom-up
      .putShort(1)                           // planes
      .putShort((channels * 8).toShort)      // bits per pixel
      .putInt(0)                             // BI_RGB (uncompressed)
      .putInt(imgSize.toInt)
      .putInt(2835).putInt(2835)             // 72 DPI in px/metre
      .putInt(0).putInt(0)                   // palette sizes
      .put(pixels)
    bb.array()
  }

  /** Columnar BMP synthesis: the three md5-over-hex meta derivations run
    * as codegen'd Spark expressions ([[fakeImageMeta]] — same math the
    * DuckDB oracle replays), and only the constant-work header write is
    * a UDF. This is the fixture-stage form of [[bmpBlob]]; keys stage it
    * to parquet once and decode from there, so the measured query is the
    * byte-layout parse, not blob generation. */
  def bmpBlobCol(payloadCol: Column): Column = {
    val m = fakeImageMeta(payloadCol)
    val build = udf((p: Array[Byte], w: Int, h: Int, c: Int) =>
      bmpBlobFromMeta(p, w, h, c))
    build(payloadCol, m.getField("width"), m.getField("height"),
      m.getField("channels"))
  }

  /** The REAL header decoder (round-9, replacing the stub for
    * `mm_image_meta`/`mm_resize`): parses genuine BMP bytes by the
    * public layout — magic "BM" at 0, int32 width at 18, int32 height
    * at 22 (negative = top-down, so |height|), uint16 bit-count at 28.
    * Rejects non-BMP payloads loudly rather than guessing. */
  object BmpDecoder extends BlobDecoder {
    def decode(bytes: Array[Byte]): DecodedMeta = {
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
        s"not a BMP blob (${bytes.length} bytes)")
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val width = bb.getInt(18)
      val height = math.abs(bb.getInt(22))
      val bits = bb.getShort(28) & 0xffff
      require(bits % 8 == 0 && bits > 0, s"unsupported bit depth $bits")
      DecodedMeta(width, height, bits / 8)
    }
  }

  // --- audio (WAV) codec: second real byte-layout format ----------------

  /** STUB audio-parameter derivation, same md5 contract as
    * [[fakeImageMeta]]: sample rate 8000-48000 Hz, 1-2 channels,
    * 8/16/24-bit depth — the values the WAV synthesis embeds and the
    * DuckDB oracle predicts from the source text. */
  def fakeAudioMeta(p: Column): Column = struct(
    (pmod(saltedHash(p, "-sr"), lit(40001)) + 8000).cast("int")
      .as("sample_rate"),
    (pmod(saltedHash(p, "-ac"), lit(2)) + 1).cast("int").as("channels"),
    ((pmod(saltedHash(p, "-bd"), lit(3)) + 1) * 8).cast("int").as("bits"))

  /** Synthesize a REAL RIFF/WAVE blob (canonical 44-byte PCM header,
    * little-endian per the public WAV layout): RIFF size, "WAVE", a
    * 16-byte "fmt " chunk (PCM format 1, channels, sample rate, byte
    * rate, block align, bit depth) and a "data" chunk whose payload is
    * the text bytes — sample-truncated the same way [[bmpBlobFromMeta]]
    * is pixel-truncated (header decode never reads samples). */
  def wavBlobFromMeta(data: Array[Byte], sampleRate: Int, channels: Int,
                      bits: Int): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(ascii))
      .putInt(36 + data.length)               // RIFF chunk size
      .put("WAVE".getBytes(ascii))
      .put("fmt ".getBytes(ascii))
      .putInt(16)                             // fmt chunk size (PCM)
      .putShort(1)                            // audio format 1 = PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * (bits / 8)) // byte rate
      .putShort((channels * (bits / 8)).toShort)  // block align
      .putShort(bits.toShort)
      .put("data".getBytes(ascii))
      .putInt(data.length)
      .put(data)
    bb.array()
  }

  /** Columnar WAV synthesis — the audio sibling of [[bmpBlobCol]]:
    * codegen'd md5 parameter derivation, constant-work header UDF. */
  def wavBlobCol(payloadCol: Column): Column = {
    val m = fakeAudioMeta(payloadCol)
    val build = udf((p: Array[Byte], sr: Int, ch: Int, bits: Int) =>
      wavBlobFromMeta(p, sr, ch, bits))
    build(payloadCol, m.getField("sample_rate"), m.getField("channels"),
      m.getField("bits"))
  }

  // --- heterogeneous decode: magic-byte dispatch -------------------------

  /** Format-tagged metadata for mixed-format blob tables: `kind` is the
    * sniffed container, (a, b, c) are its primary parameters — bmp:
    * (width, height, channels); wav: (sample_rate, channels, bits). */
  case class MediaMeta(kind: String, a: Long, b: Long, c: Long)

  /** Decoded record for the mixed-format path. */
  case class DecodedMedia(id: Long, meta: MediaMeta)

  /** Decoder for heterogeneous blobs — same lifecycle contract as
    * [[BlobDecoder]], format-tagged output. */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    def decode(bytes: Array[Byte]): MediaMeta
    def close(): Unit = ()
  }

  /** Magic-byte dispatch over the real codecs — what a production lake
    * decode stage does with a mixed media directory: sniff the container
    * from leading bytes (never from a filename or a side channel), then
    * route to the format parser. Unknown containers fail loudly. */
  object SniffDecoder extends MediaDecoder {
    private val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def decode(bytes: Array[Byte]): MediaMeta = {
      if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M') {
        val m = BmpDecoder.decode(bytes)
        MediaMeta("bmp", m.width.toLong, m.height.toLong, m.channels.toLong)
      } else if (bytes.length >= 44 &&
          new String(bytes, 0, 4, ascii) == "RIFF" &&
          new String(bytes, 8, 4, ascii) == "WAVE") {
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        require((bb.getShort(20) & 0xffff) == 1,
          s"unsupported WAV audio format ${bb.getShort(20)}")
        val channels = (bb.getShort(22) & 0xffff).toLong
        val sampleRate = bb.getInt(24).toLong
        val bits = (bb.getShort(34) & 0xffff).toLong
        MediaMeta("wav", sampleRate, channels, bits)
      } else sys.error(
        s"unrecognized media container (${bytes.length} bytes)")
    }
  }

  /** Mixed-format batch decode — [[decodeWith]]'s dispatch sibling. */
  def decodeMediaWith(blobs: Dataset[Blob],
                      decoder: MediaDecoder): Dataset[DecodedMedia] = {
    import blobs.sparkSession.implicits._
    decodePartitions(blobs, () => decoder.open(), () => decoder.close(),
      (b: Blob) => DecodedMedia(b.id, decoder.decode(b.bytes)))
  }

  /** Batch decode via `mapPartitions` — the Scala analog of a Pandas-UDF
    * `mapInPandas` decode stage: one decoder per partition (open/close
    * around the iterator), rows streamed, output typed. Narrow — scales
    * by repartitioning the payload table, nothing else. */
  def decodeWith(blobs: Dataset[Blob], decoder: BlobDecoder): Dataset[Decoded] = {
    import blobs.sparkSession.implicits._
    decodePartitions(blobs, () => decoder.open(), () => decoder.close(),
      (b: Blob) => Decoded(b.id, decoder.decode(b.bytes)))
  }

  /** Shared per-partition decode lifecycle (both typed decode paths). */
  private def decodePartitions[O](blobs: Dataset[Blob], openF: () => Unit,
      closeF: () => Unit, f: Blob => O)(
      implicit enc: org.apache.spark.sql.Encoder[O]): Dataset[O] = {
    blobs.mapPartitions { it =>
      openF()
      // Close exactly once per task, at task end — covers partial
      // consumption (e.g. downstream LIMIT) and exceptions thrown by
      // decode(), which a close-inside-hasNext scheme leaks.
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; closeF() }
      Option(org.apache.spark.TaskContext.get()) match {
        case Some(ctx) =>
          ctx.addTaskCompletionListener[Unit](_ => closeOnce())
          it.map(f)
        case None =>
          // No task context (plain-iterator callers, some test harnesses):
          // fall back to close-on-exhaustion plus close-on-throw. Partial
          // consumption without a failure can still leak here — that is
          // inherent to the fallback, which is why the listener path is
          // preferred whenever a TaskContext exists.
          new Iterator[O] {
            def hasNext: Boolean = {
              val h = try it.hasNext
                      catch { case e: Throwable => closeOnce(); throw e }
              if (!h) closeOnce()
              h
            }
            def next(): O =
              try f(it.next())
              catch { case e: Throwable => closeOnce(); throw e }
          }
      }
    }
  }
}

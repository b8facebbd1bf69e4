package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal._

class MultimodalSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("payload round-trips byte length and md5 of the UTF-8 text") {
    val r = Seq(("abc"), ("")).toDF("text")
      .select(blobLen(payload($"text")).as("n"),
        blobMd5(payload($"text")).as("m")).collect()
    assert(r(0).getInt(0) == 3)
    assert(r(0).getString(1) == "900150983cd24fb0d6963f7d28e17f72")
    assert(r(1).getInt(0) == 0)
    assert(r(1).getString(1) == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("fakeImageMeta is deterministic and in range") {
    val m = docs.select(fakeImageMeta(payload($"text")).as("m"))
      .select($"m.width", $"m.height", $"m.channels").collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getInt(0) >= 64 && r.getInt(0) < 1344)
      assert(r.getInt(1) >= 64 && r.getInt(1) < 784)
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 3)
    }
    val again = docs.select(fakeImageMeta(payload($"text")).as("m"))
      .select($"m.width", $"m.height", $"m.channels").collect()
    assert(m.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("byteHistogram kernel: known bytes land in the right bins") {
    import graft.functions.ByteHistogramExpr
    // "0Az~" = 0x30, 0x41, 0x7a, 0x7e → bins 3, 4, 7, 7
    val h = ByteHistogramExpr.compute("0Az~".getBytes("US-ASCII"))
      .toLongArray()
    assert(h.length == 16)
    assert(h(3) == 1 && h(4) == 1 && h(7) == 2 && h.sum == 4)
    // high-bit bytes reach the top bins (byte & 0xff, not sign-extended)
    val hb = ByteHistogramExpr.compute(Array(0xff.toByte, 0x80.toByte))
      .toLongArray()
    assert(hb(15) == 1 && hb(8) == 1)
    // empty payload: all-zero histogram, no division anywhere
    assert(ByteHistogramExpr.compute(Array.emptyByteArray)
      .toLongArray().forall(_ == 0L))
  }

  test("fakeFeatures feed Similarity.cosine unchanged") {
    val feats = docs.limit(50).select($"doc_id",
      fakeFeatures(payload($"text"), 8).as("embedding"))
    val c = graft.operators.Similarity.cosine($"a.embedding", $"b.embedding")
    val pairs = feats.as("a").join(feats.as("b"),
        $"a.doc_id" < $"b.doc_id")
      .select(c.as("cos")).collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(!r.isNullAt(0) &&
      math.abs(r.getDouble(0)) <= 1.0 + 1e-12))
  }

  test("frameSamples covers the payload in nFrames slices") {
    val fr = Seq("abcdefgh").toDF("text")
      .select(explode(frameSamples(payload($"text"), 4)).as("f"))
      .select($"f.frame_idx", $"f.frame_md5").collect()
    assert(fr.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    // 8 bytes / 4 frames = 2-byte frames: "ab" "cd" "ef" "gh"
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(fr.map(_.getString(1)).toSeq ==
      Seq(m("ab"), m("cd"), m("ef"), m("gh")))
  }

  test("bmpBlob/BmpDecoder: real header bytes round-trip the generated " +
      "dims, independent of the md5 derivation") {
    val text = "some document payload".getBytes("UTF-8")
    val blob = bmpBlob(text)
    // spec anchors: magic, pixel-data offset, INFOHEADER size
    assert(blob(0) == 'B'.toByte && blob(1) == 'M'.toByte)
    val bb = java.nio.ByteBuffer.wrap(blob)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(10) == 54 && bb.getInt(14) == 40)
    assert(BmpDecoder.decode(blob) == FakeDecoder.decode(text))
    // hand-built header with KNOWN dims (parser must not consult any
    // hash): 33 x 7, 24-bit, top-down (negative height)
    val hand = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hand.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
      .putInt(40).putInt(33).putInt(-7).putShort(1).putShort(24)
    assert(BmpDecoder.decode(hand.array()) == DecodedMeta(33, 7, 3))
    // non-BMP payloads are rejected loudly, not guessed at
    intercept[IllegalArgumentException] {
      BmpDecoder.decode("definitely not a bitmap".getBytes("UTF-8"))
    }
  }

  test("wavBlobFromMeta/SniffDecoder: RIFF header bytes round-trip known " +
      "params, and dispatch routes on magic bytes alone") {
    // hand-built WAV with KNOWN params: 44100 Hz, 2 ch, 16-bit
    val wav = wavBlobFromMeta("payload".getBytes("UTF-8"), 44100, 2, 16)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(wav, 8, 4, "US-ASCII") == "WAVE")
    val bb = java.nio.ByteBuffer.wrap(wav)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // spec anchors: fmt chunk size 16, PCM format 1, derived byte rate
    // and block align, data chunk size = payload length
    assert(bb.getInt(16) == 16 && bb.getShort(20) == 1)
    assert(bb.getInt(28) == 44100 * 2 * 2 && bb.getShort(32) == 4)
    assert(new String(wav, 36, 4, "US-ASCII") == "data")
    assert(bb.getInt(40) == 7)
    assert(SniffDecoder.decode(wav) == MediaMeta("wav", 44100L, 2L, 16L))
    // dispatch: the same decoder parses a BMP via its magic
    val text = "another payload".getBytes("UTF-8")
    val img = FakeDecoder.decode(text)
    assert(SniffDecoder.decode(bmpBlob(text)) ==
      MediaMeta("bmp", img.width.toLong, img.height.toLong,
        img.channels.toLong))
    // unknown containers fail loudly
    intercept[RuntimeException] {
      SniffDecoder.decode("neither format".getBytes("UTF-8"))
    }
  }

  test("decodeWith: mapPartitions decode matches the column-level stub") {
    val blobs = docs.limit(20)
      .select($"doc_id".as("id"), payload($"text").as("bytes"))
      .as[Blob]
    val decoded = decodeWith(blobs, FakeDecoder).collect()
      .map(d => d.id -> d.meta).toMap
    val viaCols = docs.limit(20)
      .select($"doc_id", fakeImageMeta(payload($"text")).as("m"))
      .select($"doc_id", $"m.width", $"m.height", $"m.channels").collect()
      .map(r => r.getLong(0) ->
        DecodedMeta(r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(decoded == viaCols)
  }

  test("decodeWith: decoder closes exactly once per task, even on failure") {
    import MultimodalSpec._
    CountingDecoder.reset()
    val blobs = docs.limit(20)
      .select($"doc_id".as("id"), payload($"text").as("bytes"))
      .as[Blob].repartition(2)
    decodeWith(blobs, CountingDecoder).collect()
    assert(CountingDecoder.opens.get() == 2)
    assert(CountingDecoder.closes.get() == 2,
      s"expected one close per task, got ${CountingDecoder.closes.get()}")

    // decode() throwing mid-stream must still close (task-completion
    // listener fires on failure too), and must not double-close.
    CountingDecoder.reset()
    val boom = intercept[org.apache.spark.SparkException] {
      decodeWith(blobs, ThrowingDecoder).collect()
    }
    assert(boom.getMessage != null)
    assert(CountingDecoder.closes.get() == CountingDecoder.opens.get(),
      "every opened decoder must be closed after a failed task")
  }

  test("mm_phash_dedup: identical payloads rank first at hamming 0") {
    // two byte-identical texts hash equal through the staged-blob path
    // (dHash read PAST the 54-byte header), so their pair heads the
    // ranked candidate queue at hamming 0; the third, shuffled text
    // lands at a positive distance if banding surfaces it at all
    val dir = java.nio.file.Files.createTempDirectory("graft_ph").toString
    val base = ('a' to 'z').mkString(" ") + " the quick brown fox " * 3
    Seq((1L, base, "en", "a", 0L), (2L, base, "en", "a", 0L),
        (3L, base.reverse, "en", "a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("mm_phash_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.head == ((1L, 2L, 0L)))
    assert(rows.tail.forall(_._3 > 0))
  }
}

object MultimodalSpec {
  import graft.operators.Multimodal._
  import java.util.concurrent.atomic.AtomicInteger

  object CountingDecoder extends BlobDecoder {
    val opens = new AtomicInteger(0)
    val closes = new AtomicInteger(0)
    def reset(): Unit = { opens.set(0); closes.set(0) }
    override def open(): Unit = opens.incrementAndGet()
    override def close(): Unit = closes.incrementAndGet()
    def decode(bytes: Array[Byte]): DecodedMeta = FakeDecoder.decode(bytes)
  }

  object ThrowingDecoder extends BlobDecoder {
    override def open(): Unit = CountingDecoder.opens.incrementAndGet()
    override def close(): Unit = CountingDecoder.closes.incrementAndGet()
    def decode(bytes: Array[Byte]): DecodedMeta =
      throw new IllegalStateException("decode failure injection")
  }
}

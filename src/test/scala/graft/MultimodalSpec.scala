package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal._

/** Multimodal plumbing: typed asset schema, batched per-partition feature
  * extraction (the mapInPandas-shaped loop), deterministic stub decode,
  * resize/frame-sample contracts. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def assets = Multimodal.assetsFromDocuments(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text"))

  test("asset schema: opaque binary content + typed metadata struct") {
    val schema = assets.schema
    assert(schema("content").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq ==
      Seq("width", "height", "sample_rate", "duration_ms", "format"))
  }

  test("batched feature extraction is deterministic and length-stable") {
    import spark.implicits._
    val ds = assets.as[MediaAsset].repartition(3, col("kind"))
    val feats = Multimodal.extractFeatures(ds).collect()
    assert(feats.length == assets.count())
    assert(feats.forall(_.feature.length == Multimodal.FeatureDim))
    // deterministic: same input → same histogram, sums to ~1
    val f = feats.minBy(_.asset_id)
    val again = Multimodal.decodeStub(
      assets.orderBy("asset_id").select("content").as[Array[Byte]].head())
    assert(f.feature.toSeq == again.toSeq)
    assert(math.abs(f.feature.sum - 1f) < 1e-3)
  }

  test("feature extraction over REAL binary files via the binaryFile source") {
    import spark.implicits._
    // genuine non-UTF-8 bytes on disk, read through the production
    // source — not text cast to binary
    val fixDir = graft.source.BinaryFixtures.ensure(spark, "/root/testdata/sf0.001")
    val real = spark.read.format("binaryFile").load(s"$fixDir/*.bin")
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
          .cast("long").as("asset_id"),
        lit("image").as("kind"), col("content"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit(0).as("sample_rate"), lit(0L).as("duration_ms"),
          lit("bin").as("format")).as("meta"))
      .as[MediaAsset]
    val feats = Multimodal.extractFeatures(real).collect()
    assert(feats.nonEmpty)
    // lengths follow the generator's 16·((id div 10)%4+1) rule (all four
    // 16/32/48/64 variants present) and features reproduce the stub
    // decode of the same on-disk bytes
    assert(feats.forall(f => f.n_bytes == 16 * (f.asset_id / 10 % 4 + 1)))
    assert(feats.map(_.n_bytes).distinct.sorted.toSeq == Seq(16, 32, 48, 64))
    val byId = real.collect().map(a => a.asset_id -> a.content).toMap
    assert(feats.forall(f =>
      f.feature.toSeq == Multimodal.decodeStub(byId(f.asset_id)).toSeq))
  }

  test("resize pads/crops to the requested dim; frame sampling strides") {
    assert(Multimodal.resizeStub(Array(1f, 2f, 3f), 2).toSeq == Seq(1f, 2f))
    assert(Multimodal.resizeStub(Array(1f), 3).toSeq == Seq(1f, 0f, 0f))
    val frames = Multimodal.sampleFrames(Array.tabulate(100)(_.toByte), 10, 3)
    assert(frames.map(_._1) == Seq(0, 3, 6, 9))
    assert(frames.head._2.length == 10)
  }

  private def bytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("withImageDims parses real PNG and GIF headers; junk is unknown") {
    import spark.implicits._
    val rows = Seq(
      // PNG, 800x600: sig + IHDR len/type + dims
      (1L, bytes("89504E470D0A1A0A0000000D49484452" +
        "00000320" + "00000258" + "08060000")),
      // GIF89a, 320x200 little-endian
      (2L, bytes("474946383961" + "4001" + "C800" + "F7000000")),
      // GIF87a accepted too (16x16)
      (3L, bytes("474946383761" + "1000" + "1000" + "00")),
      // JPEG bytes are unknown to the fixed-offset path
      (4L, bytes("FFD8FFE000104A46494600")),
      (5L, bytes("DEADBEEF")))
      .toDF("asset_id", "content")
    val out = Multimodal.withImageDims(rows).collect()
      .map(r => r.getLong(0) -> ((r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(out(1L) === (("png", Some(800L), Some(600L))))
    assert(out(2L) === (("gif", Some(320L), Some(200L))))
    assert(out(3L) === (("gif", Some(16L), Some(16L))))
    assert(out(4L) === (("unknown", None, None)))
    assert(out(5L) === (("unknown", None, None)))
  }

  test("withAudioMeta parses canonical PCM WAV headers; junk is unknown") {
    import spark.implicits._
    // 44.1 kHz stereo 16-bit, 1000 declared data bytes: RIFF size 1036,
    // byte rate 176400, block align 4 — all little-endian
    val canonical = "52494646" + "0C040000" + "57415645" +
      "666D7420" + "10000000" + "0100" + "0200" + "44AC0000" +
      "10B10200" + "0400" + "1000" + "64617461" + "E8030000" + "00"
    // same header with byte rate 0: duration must be NULL, not an error
    val zeroRate = "52494646" + "0C040000" + "57415645" +
      "666D7420" + "10000000" + "0100" + "0200" + "44AC0000" +
      "00000000" + "0400" + "1000" + "64617461" + "E8030000" + "00"
    // a LIST chunk between WAVE and fmt breaks the canonical layout —
    // the relational path must NOT misparse it (wavMeta's job below)
    val nonCanonical = "52494646" + "28000000" + "57415645" +
      "4C495354" + "04000000" + "494E464F" +
      "666D7420" + "10000000" + "0100" + "0100" + "401F0000" +
      "803E0000" + "0200" + "1000" + "64617461" + "00000000"
    val rows = Seq(
      (1L, bytes(canonical)), (2L, bytes(zeroRate)),
      (3L, bytes(nonCanonical)), (4L, bytes("DEADBEEF")))
      .toDF("asset_id", "content")
    val out = Multimodal.withAudioMeta(rows).collect()
      .map(r => r.getLong(0) -> ((r.getString(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)),
        Option(r.get(6)), Option(r.get(7))))).toMap
    assert(out(1L) === (("wav", Some(2L), Some(44100L), Some(16L),
      Some(1000L), Some(1000L * 1000000L / 176400L))))
    assert(out(2L) === (("wav", Some(2L), Some(44100L), Some(16L),
      Some(1000L), None)))
    assert(out(3L) === (("unknown", None, None, None, None, None)))
    assert(out(4L) === (("unknown", None, None, None, None, None)))
  }

  test("audioWindowPlan: hand-computed ranges, truncated tail, non-wav drops") {
    import spark.implicits._
    // 1 kHz mono 16-bit (blk 2), 50 declared data bytes = 25 samples.
    // winMs=10 → win 10 samples; hopMs=5 → hop 5; ceil(25/5) = 5 windows,
    // the last starting at sample 20 with only 5 samples left.
    val wav = "52494646" + "4A000000" + "57415645" +
      "666D7420" + "10000000" + "0100" + "0100" + "E8030000" +
      "D0070000" + "0200" + "1000" + "64617461" + "32000000" + "00"
    val rows = Seq((1L, bytes(wav)), (2L, bytes("DEADBEEF")))
      .toDF("asset_id", "content")
    val plan = Multimodal.audioWindowPlan(
        Multimodal.withAudioMeta(rows), winMs = 10, hopMs = 5)
      .select("asset_id", "window_idx", "sample_off", "n_samples",
        "byte_off", "byte_len")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(plan.forall(_._1 == 1L)) // the junk row planned nothing
    assert(plan.toSeq == Seq(
      (1L, 0L, 0L, 10L, 44L, 20L),
      (1L, 1L, 5L, 10L, 54L, 20L),
      (1L, 2L, 10L, 10L, 64L, 20L),
      (1L, 3L, 15L, 10L, 74L, 20L),
      (1L, 4L, 20L, 5L, 84L, 10L))) // truncated tail window
  }

  test("imagePatchPlan: grid covers the image exactly, edges truncate") {
    import spark.implicits._
    // a 130×65 PNG at patch 64: 3 cols × 2 rows; right col 2 px wide,
    // bottom row 1 px tall
    val png = "89504E470D0A1A0A0000000D49484452" +
      "00000082" + "00000041" + "00"
    val rows = Seq((1L, bytes(png)), (2L, bytes("DEADBEEF")))
      .toDF("asset_id", "content")
    val plan = Multimodal.imagePatchPlan(
        Multimodal.withImageDims(rows), patch = 64)
      .select("asset_id", "patch_row", "patch_col", "x", "y", "pw", "ph")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(t => (t._2, t._3))
    assert(plan.forall(_._1 == 1L))
    assert(plan.length == 6)
    assert(plan.toSeq == Seq(
      (1L, 0L, 0L, 0L, 0L, 64L, 64L),
      (1L, 0L, 1L, 64L, 0L, 64L, 64L),
      (1L, 0L, 2L, 128L, 0L, 2L, 64L),
      (1L, 1L, 0L, 0L, 64L, 64L, 1L),
      (1L, 1L, 1L, 64L, 64L, 64L, 1L),
      (1L, 1L, 2L, 128L, 64L, 2L, 1L)))
    // patch areas tile the image exactly once
    assert(plan.map(t => t._6 * t._7).sum == 130L * 65L)
  }

  test("wavMeta walks non-canonical chunk lists") {
    // LIST/INFO chunk ahead of fmt — the layout withAudioMeta declines
    val listed = bytes("52494646" + "30000000" + "57415645" +
      "4C495354" + "04000000" + "494E464F" +
      "666D7420" + "10000000" + "0100" + "0100" + "401F0000" +
      "803E0000" + "0200" + "1000" + "64617461" + "08000000" +
      "0000000000000000")
    assert(Multimodal.wavMeta(listed) === Some((1, 8000, 16, 8L)))
    // odd-sized chunk bodies pad to even: a 5-byte LIST still lands fmt
    val odd = bytes("52494646" + "2D000000" + "57415645" +
      "4C495354" + "05000000" + "494E464F" + "41" + "00" +
      "666D7420" + "10000000" + "0100" + "0200" + "44AC0000" +
      "10B10200" + "0400" + "1000" + "64617461" + "04000000" +
      "00000000")
    assert(Multimodal.wavMeta(odd) === Some((2, 44100, 16, 4L)))
    // declared data size is reported even when the body is truncated —
    // the auditor's comparison point, not a parse failure
    val truncated = bytes("52494646" + "FF000000" + "57415645" +
      "666D7420" + "10000000" + "0100" + "0100" + "401F0000" +
      "803E0000" + "0200" + "1000" + "64617461" + "E8030000")
    assert(Multimodal.wavMeta(truncated) === Some((1, 8000, 16, 1000L)))
    assert(Multimodal.wavMeta(bytes("52494646")) === None)
    assert(Multimodal.wavMeta(bytes("DEADBEEF00000000DEADBEEF")) === None)
    assert(Multimodal.wavMeta(Array.empty[Byte]) === None)
  }

  private val unityMatrix =
    "000100000000000000000000" +
      "000000000001000000000000" +
      "000000000000000040000000"

  /** Canonical MP4 header (the exact layout withVideoMeta pins):
    * 24-byte ftyp/isom, moov(216) = mvhd v0(108) + trak(100)/tkhd(92). */
  private def canonicalMp4(ts: Int, dur: Int, w: Int, h: Int): String = {
    def be32(v: Long) = f"$v%08X"
    "00000018" + "66747970" + "69736F6D" + "00000200" +
      "69736F6D69736F32" +
      "000000D8" + "6D6F6F76" +
      "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
      be32(ts) + be32(dur) +
      "00010000" + "0100" + "0000" + "0" * 16 + unityMatrix +
      "0" * 48 + "00000002" +
      "00000064" + "7472616B" + "0000005C" + "746B6864" +
      "00000000" + "00000000" + "00000000" + "00000001" + "00000000" +
      be32(dur) +
      "0" * 16 + "0000" + "0000" + "0000" + "0000" + unityMatrix +
      be32(w.toLong * 65536) + be32(h.toLong * 65536)
  }

  test("withVideoMeta parses canonical MP4 headers; junk is unknown") {
    import spark.implicits._
    val rows = Seq(
      (1L, canonicalMp4(ts = 1200, dur = 3003, w = 321, h = 203) + "AB"),
      (2L, "DEADBEEF" * 16))
    val df = rows.toDF("doc_id", "hx")
      .select($"doc_id", org.apache.spark.sql.functions.unhex($"hx")
        .as("content"))
    val got = Multimodal.withVideoMeta(df)
      .select("doc_id", "vfmt", "v_timescale", "v_dur_units", "vid_w",
        "vid_h", "vdur_us")
      .as[(Long, String, Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "mp4", Some(1200L), Some(3003L), Some(321L), Some(203L),
        Some(3003L * 1000000L / 1200L)),
      (2L, "unknown", None, None, None, None, None)))
  }

  test("mp4Meta walks non-canonical box layouts") {
    // free padding before moov, udta before mvhd, an AUDIO track
    // (width 0) ahead of the video track — the layout withVideoMeta
    // declines and the walker must handle
    def tkhdV0(w: Int, h: Int, vol: String) =
      "0000005C" + "746B6864" + "00000000" + "00000000" + "00000000" +
        "00000001" + "00000000" + "00000000" + "0" * 16 +
        "0000" + "0000" + vol + "0000" + unityMatrix +
        f"${w.toLong * 65536}%08X" + f"${h.toLong * 65536}%08X"
    val a = bytes(
      "0000000C" + "66726565" + "00000000" +
        "00000148" + "6D6F6F76" +
        "0000000C" + "75647461" + "00000000" +
        "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
        "000003E8" + "00001388" + "0" * 160 +
        "00000064" + "7472616B" + tkhdV0(0, 0, "0100") + // audio: w 0
        "00000064" + "7472616B" + tkhdV0(640, 360, "0000"))
    assert(Multimodal.mp4Meta(a) === Some((1000L, 5000L, 640, 360)))
    // withVideoMeta's canonical parse declines this layout — the
    // wavMeta/withAudioMeta split on the video side
    import spark.implicits._
    val df = Seq((1L, a)).toDF("doc_id", "content")
    assert(Multimodal.withVideoMeta(df).select("vfmt")
      .as[String].head() == "unknown")

    // v1 mvhd (64-bit times) + v1 tkhd, moov size 0 = to end-of-file
    val b = bytes(
      "00000000" + "6D6F6F76" +
        "00000078" + "6D766864" + "01000000" + "0" * 16 + "0" * 16 +
        "00015F90" + "000000000006DDD0" + "0" * 160 +
        "00000070" + "7472616B" +
        "00000068" + "746B6864" + "01000000" + "0" * 16 + "0" * 16 +
        "00000001" + "00000000" + "0" * 16 + "0" * 16 +
        "0000" + "0000" + "0000" + "0000" + unityMatrix +
        "05000000" + "02D00000")
    assert(Multimodal.mp4Meta(b) === Some((90000L, 450000L, 1280, 720)))

    // 64-bit largesize moov header
    val c = bytes(
      "00000001" + "6D6F6F76" + "00000000000000E0" +
        "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
        "00000018" + "00000060" + "0" * 160 +
        "00000064" + "7472616B" + tkhdV0(16, 9, "0000"))
    assert(Multimodal.mp4Meta(c) === Some((24L, 96L, 16, 9)))

    // junk, truncation, emptiness → None, never a throw
    assert(Multimodal.mp4Meta(bytes("0000000866726565")) === None)
    assert(Multimodal.mp4Meta(bytes("DEADBEEF")) === None)
    assert(Multimodal.mp4Meta(Array.empty[Byte]) === None)
    assert(Multimodal.mp4Meta(a.take(60)) === None)
  }

  test("videoSamplePlan: hand-computed ranges, truncated tail, non-mp4 drops") {
    import spark.implicits._
    val meta = Seq(
      (1L, "mp4", Some(100000L)), // 100 ms → 3 windows at 40 ms
      (2L, "unknown", None: Option[Long]))
      .toDF("doc_id", "vfmt", "vdur_us")
    val got = Multimodal.videoSamplePlan(meta, sampleEveryMs = 40)
      .select("doc_id", "sample_idx", "t_off_us", "t_len_us")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 40000L),
      (1L, 1L, 40000L, 40000L),
      (1L, 2L, 80000L, 20000L)))
    intercept[IllegalArgumentException](
      Multimodal.videoSamplePlan(meta, sampleEveryMs = 0))
  }

  test("mp4SampleTables parses stsz (both forms) + stco down the chain") {
    // moov > trak > mdia > minf > stbl with a 3-entry per-sample stsz
    // (sizes 100,116,132) and a 3-entry stco (offsets 4096,4196,4312)
    def stbl(stsz: String, stco: String) = {
      val stblBody = stsz + stco
      def box(tag: String, body: String) =
        f"${8 + body.length / 2}%08X" + tag + body
      val sb = box("7374626C", stblBody)
      val minf = box("6D696E66", sb)
      val mdia = box("6D646961", minf)
      val trak = box("7472616B", mdia)
      box("6D6F6F76", trak)
    }
    val perSample = stbl(
      "00000020" + "7374737A" + "00000000" + "00000000" + "00000003" +
        "00000064" + "00000074" + "00000084",
      "0000001C" + "7374636F" + "00000000" + "00000003" +
        "00001000" + "00001064" + "000010D8")
    assert(Multimodal.mp4SampleTables(bytes(perSample)) match {
      case Some((s, o)) =>
        s.toSeq == Seq(100L, 116L, 132L) &&
          o.toSeq == Seq(4096L, 4196L, 4312L)
      case None => false
    })
    // compact constant-size stsz form: sample_size ≠ 0, no table
    val constSize = stbl(
      "00000014" + "7374737A" + "00000000" + "000000C8" + "00000002",
      "00000018" + "7374636F" + "00000000" + "00000002" +
        "00002000" + "000020C8")
    assert(Multimodal.mp4SampleTables(bytes(constSize)) match {
      case Some((s, o)) =>
        s.toSeq == Seq(200L, 200L) && o.toSeq == Seq(8192L, 8392L)
      case None => false
    })
    // a file cut mid-table (the last stco entry's bytes missing) and
    // junk degrade to None, never a throw
    assert(Multimodal.mp4SampleTables(
      bytes(perSample).dropRight(4)) === None)
    assert(Multimodal.mp4SampleTables(bytes("DEADBEEF")) === None)
    assert(Multimodal.mp4SampleTables(Array.empty[Byte]) === None)
  }

  test("videoSamplePlan emits byte ranges from tables, NULL without") {
    import spark.implicits._
    val meta = Seq(
      // 100 ms, 2 samples: instants 0,1 → sample 0; instant 2 → 1
      (1L, "mp4", Some(100000L), Some(Seq(100L, 116L)),
        Some(Seq(4096L, 4196L))),
      (2L, "mp4", Some(100000L), None: Option[Seq[Long]],
        None: Option[Seq[Long]]))
      .toDF("doc_id", "vfmt", "vdur_us", "sample_sizes", "chunk_offs")
    val got = Multimodal.videoSamplePlan(meta, sampleEveryMs = 40)
      .select("doc_id", "sample_idx", "byte_off", "byte_len")
      .as[(Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 0L, Some(4096L), Some(100L)),
      (1L, 1L, Some(4096L), Some(100L)), // 40000·2/100000 = 0
      (1L, 2L, Some(4196L), Some(116L)), // 80000·2/100000 = 1
      (2L, 0L, None, None), (2L, 1L, None, None), (2L, 2L, None, None)))
  }

  test("videoSamplePlan clamps adversarial headers instead of overflowing") {
    import spark.implicits._
    // u32 duration at timescale 1 → vdur_us ~4.3e15; 2^20 samples:
    // t_off_us · n overflows Long partway through the instant grid —
    // every row must land on a valid clamped sample, never throw
    val n = 1 << 20
    val meta = Seq(
      (1L, "mp4", Some(4300000000000000L),
        Some(Seq.tabulate(n)(i => 100L + i)),
        Some(Seq.tabulate(n)(i => 4096L + 8L * i))))
      .toDF("doc_id", "vfmt", "vdur_us", "sample_sizes", "chunk_offs")
    val got = Multimodal.videoSamplePlan(meta, sampleEveryMs = 2000000000)
      .select("sample_idx", "byte_off", "byte_len")
      .as[(Long, Option[Long], Option[Long])].collect()
    assert(got.length === 2150)
    val dur = 4300000000000000L
    val step = 2000000000L * 1000L
    got.foreach { case (k, off, len) =>
      val t = k * step
      // exact index while t·n fits a Long, the double-ratio fallback
      // beyond — the same arithmetic the plan's coalesce takes
      val j =
        if (t <= Long.MaxValue / n) t * n / dur
        else math.floor((t.toDouble / dur) * n).toLong
      assert(off === Some(4096L + 8L * j))
      assert(len === Some(100L + j))
    }
  }

  test("jpegDims walks the marker stream to SOF0") {
    // SOI + APP0 (16 bytes) + DHT (to prove non-frame C4 is skipped) +
    // SOF0 with height 480, width 640, then EOI
    val jpeg = bytes(
      "FFD8" +
        "FFE0" + "0010" + "4A46494600010100000100010000" +
        "FFC4" + "0004" + "0000" +
        "FFC0" + "0011" + "08" + "01E0" + "0280" +
        "03012200021101031101" +
        "FFD9")
    assert(Multimodal.jpegDims(jpeg) === Some((640, 480)))
    assert(Multimodal.jpegDims(bytes("FFD8FF")) === None)
    assert(Multimodal.jpegDims(bytes("89504E47")) === None)
    assert(Multimodal.jpegDims(Array.empty[Byte]) === None)
  }
}

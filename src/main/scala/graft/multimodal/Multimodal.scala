package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed media asset: opaque bytes + typed metadata. The schema contract
  * for multimodal training-data pipelines — content is never interpreted
  * by Spark itself (parquet BINARY / `binaryFile` source at scale), all
  * shaping happens on the metadata struct, and decode/feature steps run
  * per-partition in fixed-size batches. */
case class MediaMeta(
    width: Int,          // images/video
    height: Int,
    sample_rate: Int,    // audio
    duration_ms: Long,
    format: String)

case class MediaAsset(
    asset_id: Long,
    kind: String, // image | audio | video
    content: Array[Byte],
    meta: MediaMeta)

case class MediaFeature(
    asset_id: Long,
    kind: String,
    n_bytes: Long,
    feature: Array[Float])

/** Multimodal column operators. The decode step is a clearly-marked
  * DETERMINISTIC STUB (this container has no image/audio codecs): a real
  * deployment swaps [[Multimodal.decodeStub]] for a JPEG/PCM decoder with
  * the same signature; everything around it — the schema, the
  * per-partition batch loop, the partitioning — is the real plumbing and
  * is what the tests pin down.
  *
  * Scale: feature extraction is `mapPartitions` over batches of
  * [[Multimodal.BatchSize]] assets, the Arrow-style shape a Python
  * `mapInPandas` worker would see; no shuffle is introduced — partition
  * by `kind` upstream if decoders are heterogeneous (GPU vs CPU pools).
  */
object Multimodal {

  val BatchSize = 64
  val FeatureDim = 16

  /** STUB for the real media decoder: deterministic 16-bin byte histogram
    * normalized by length. Signature and batch usage match a real
    * decode-to-embedding step; only the math is fake. */
  def decodeStub(content: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    if (content.nonEmpty) {
      content.foreach { b => hist((b & 0xFF) / FeatureDim) += 1f }
      var i = 0
      while (i < FeatureDim) { hist(i) /= content.length; i += 1 }
    }
    hist
  }

  /** Fake "resize": crop/pad the feature to `dim` — stands in for image
    * resize keeping the batched, length-stable output contract. */
  def resizeStub(feature: Array[Float], dim: Int): Array[Float] =
    feature.take(dim).padTo(dim, 0f)

  /** Frame sampling for video-kind assets: every `stride`-th
    * `frameBytes`-sized block, as (frame_idx, bytes). */
  def sampleFrames(content: Array[Byte], frameBytes: Int,
                   stride: Int): Seq[(Int, Array[Byte])] = {
    // fail fast with the bad parameter's name: a zero stride would
    // otherwise surface as a bare ArithmeticException mid-task
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    content.grouped(frameBytes).zipWithIndex.collect {
      case (blk, i) if i % stride == 0 => (i, blk)
    }.toSeq
  }

  /** Batched per-partition feature extraction — the mapInPandas-shaped
    * loop: drain the partition in BatchSize groups, decode each batch,
    * emit typed features. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { a =>
          MediaFeature(a.asset_id, a.kind, a.content.length.toLong,
            decodeStub(a.content))
        }
      }
    }
  }

  /** Derive a deterministic asset table from the documents corpus (text
    * bytes stand in for media bytes; metadata is a pure function of size
    * so the oracle can replay it). */
  def assetsFromDocuments(docs: DataFrame): DataFrame = {
    val bytes = col("text").cast("binary")
    val n = octet_length(col("text"))
    val kind = when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio").otherwise("video")
    docs.select(
      col("doc_id").cast("long").as("asset_id"),
      kind.as("kind"),
      bytes.as("content"),
      struct(
        when(kind === "image", n % 640).otherwise(0).cast("int").as("width"),
        when(kind === "image", n % 480).otherwise(0).cast("int").as("height"),
        when(kind === "audio", lit(16000)).otherwise(0).cast("int").as("sample_rate"),
        when(kind =!= "image", n * 40L).otherwise(0L).as("duration_ms"),
        when(kind === "image", "png").when(kind === "audio", "wav")
          .otherwise("mkv").as("format")
      ).as("meta"))
  }

  // ── REAL header parsing (no codec required) ───────────────────────────

  /** Format sniffing + image dimensions from the container HEADER —
    * genuinely real, unlike [[decodeStub]]: magic numbers and dimension
    * fields are fixed-offset byte arithmetic, no codec anywhere. Adds
    * `fmt` ('png' | 'gif' | 'unknown'), `img_w`, `img_h` (NULL unless a
    * known header matched). Purely relational — `substring` on the
    * binary column, `hex`, `conv` — so the parse runs inside whole-stage
    * codegen on the first 32 bytes only (a 100 TB blob scan never
    * materializes content beyond the header slice it needs).
    *
    * PNG: 8-byte signature, then the IHDR chunk pins width/height as
    * big-endian u32 at byte offsets 16/20. GIF (87a/89a): 6-byte
    * signature, width/height as little-endian u16 at offsets 6/8. JPEG
    * needs a variable-length marker walk — [[jpegDims]] below. */
  def withImageDims(assets: DataFrame,
                    contentCol: String = "content"): DataFrame = {
    val h = upper(hex(substring(col(contentCol), 1, 32)))
    val isPng = h.startsWith("89504E470D0A1A0A0000000D49484452")
    val isGif = h.startsWith("47494638") &&
      substring(h, 9, 4).isin("3761", "3961")
    def be32(hexPos: Int) =
      conv(substring(h, hexPos, 8), 16, 10).cast("long")
    def le16(hexPos: Int) =
      conv(concat(substring(h, hexPos + 2, 2), substring(h, hexPos, 2)),
        16, 10).cast("long")
    assets
      .withColumn("__h", h)
      .withColumn("fmt",
        when(isPng, "png").when(isGif, "gif").otherwise("unknown"))
      .withColumn("img_w",
        when(isPng, be32(33)).when(isGif, le16(13)))
      .withColumn("img_h",
        when(isPng, be32(41)).when(isGif, le16(17)))
      .drop("__h")
  }

  /** Audio (RIFF/WAVE) metadata from the CANONICAL PCM header — the
    * audio sibling of [[withImageDims]], and just as real: every field is
    * fixed-offset byte arithmetic on the first 44 bytes, no codec. The
    * canonical layout (the overwhelming majority of PCM WAV files —
    * `RIFF` + size + `WAVE`, a 16-byte `fmt ` chunk, then `data`) pins
    * channels / sample-rate / bits-per-sample / data size at constant
    * offsets, so the parse is pure relational column algebra inside
    * whole-stage codegen; a file with extra chunks between `fmt ` and
    * `data` (LIST/INFO metadata) falls to 'unknown' here and to the
    * per-row chunk walker [[wavMeta]].
    *
    * Adds `afmt` ('wav' | 'unknown'), `channels`, `sample_rate_hz`,
    * `bits`, `data_bytes` (the DECLARED data-chunk size — a truncation
    * auditor compares it against `octet_length(content) - 44`), and
    * `dur_us` = data_bytes·10⁶ DIV byte_rate in pure nonnegative integer
    * math (byte_rate is the header's own bytes-per-second field; 0 →
    * NULL duration rather than a divide error). All metadata columns are
    * NULL unless the canonical header matched. */
  def withAudioMeta(assets: DataFrame,
                    contentCol: String = "content"): DataFrame = {
    val h = upper(hex(substring(col(contentCol), 1, 44)))
    // hex positions are 1-based: byte offset b → substring(h, 2b+1, …)
    def le16(bytePos: Int) = {
      val p = 2 * bytePos + 1
      conv(concat(substring(h, p + 2, 2), substring(h, p, 2)), 16, 10)
        .cast("long")
    }
    def le32(bytePos: Int) = {
      val p = 2 * bytePos + 1
      conv(concat(substring(h, p + 6, 2), substring(h, p + 4, 2),
        substring(h, p + 2, 2), substring(h, p, 2)), 16, 10).cast("long")
    }
    val isWav = h.startsWith("52494646") && // 'RIFF'
      substring(h, 17, 16) === "57415645666D7420" && // 'WAVE' + 'fmt '
      substring(h, 33, 8) === "10000000" && // fmt chunk size 16 (PCM)
      substring(h, 73, 8) === "64617461" // 'data' directly after fmt
    val byteRate = le32(28)
    assets
      .withColumn("afmt", when(isWav, "wav").otherwise("unknown"))
      .withColumn("channels", when(isWav, le16(22)))
      .withColumn("sample_rate_hz", when(isWav, le32(24)))
      .withColumn("bits", when(isWav, le16(34)))
      .withColumn("data_bytes", when(isWav, le32(40)))
      .withColumn("__br", when(isWav && byteRate > 0, byteRate))
      .withColumn("dur_us", expr("data_bytes * 1000000 DIV __br"))
      .drop("__br")
  }

  /** RIFF chunk walker for NON-canonical WAV files — the variable-layout
    * fallback [[withAudioMeta]] sends to 'unknown': walks the chunk list
    * (each 8-byte header = 4-char id + LE u32 size, sizes pad to even)
    * to find `fmt ` and `data` wherever they sit, e.g. behind LIST/INFO
    * metadata chunks. Per-row imperative by necessity (chunk offsets are
    * data-dependent — the [[jpegDims]] class). Returns
    * (channels, sample_rate, bits, data_bytes) or None. */
  def wavMeta(content: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u16(i: Int) = (content(i) & 0xff) | ((content(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (content(i) & 0xffL) | ((content(i + 1) & 0xffL) << 8) |
        ((content(i + 2) & 0xffL) << 16) | ((content(i + 3) & 0xffL) << 24)
    def tag(i: Int) = new String(content.slice(i, i + 4), "US-ASCII")
    if (content.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[Long] = None
    while (i + 8 <= content.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(i)
      val size = u32(i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= content.length)
        fmt = Some((u16(i + 10), u32(i + 12).toInt, u16(i + 22)))
      if (id == "data") data = Some(size)
      // chunk bodies pad to even length; a declared size past the buffer
      // ends the walk (truncated file) rather than overflowing
      val step = 8 + size + (size % 2)
      if (step <= 0 || i + step > content.length) i = content.length
      else i += step.toInt
    }
    for ((ch, sr, bits) <- fmt; d <- data) yield (ch, sr, bits, d)
  }

  /** JPEG dimensions: walk the marker stream to the first SOF0–SOF15
    * frame header (skipping the non-frame markers in that range — DHT
    * 0xC4, DAC 0xCC) and read height/width as big-endian u16 at offsets
    * 3/5 inside it. A real parser for real JPEGs; per-row imperative by
    * necessity (segments are variable-length — the justified-UDF class),
    * driver/executor-side like [[decodeStub]]'s slot. Returns None on
    * anything that is not a parseable JPEG. */
  def jpegDims(content: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = content(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (content.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var i = 2
    while (i + 3 < content.length) {
      if (u8(i) != 0xff) return None
      val marker = u8(i + 1)
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) {
        i += 2 // standalone marker, no length field
      } else {
        val len = u16(i + 2)
        if (len < 2 || i + 2 + len > content.length) return None
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (len < 7) return None
          return Some((u16(i + 7), u16(i + 5))) // (width, height)
        }
        i += 2 + len
      }
    }
    None
  }

  /** Patch-grid plan over parsed image dimensions — the vision-model
    * sibling of [[audioWindowPlan]] (ViT consumes P×P patches,
    * Dosovitskiy et al., ICLR 2021): one row per grid cell with the
    * pixel rectangle a decode UDF crops — `(…, patch_row, patch_col,
    * x, y, pw, ph)`; edge patches truncate to the image bounds,
    * unknown-format rows drop. Same 100 TB discipline as the audio
    * plan: the planner moves one metadata row per patch and never a
    * pixel — pure nonnegative integer math the oracle replays. */
  def imagePatchPlan(meta: DataFrame, patch: Int): DataFrame = {
    require(patch > 0, s"imagePatchPlan: patch=$patch")
    meta.filter(col("fmt") =!= "unknown" &&
        col("img_w") > 0 && col("img_h") > 0)
      .withColumn("patch_row",
        explode(sequence(lit(0L), expr(s"(img_h + ${patch - 1}) DIV $patch - 1"))))
      .withColumn("patch_col",
        explode(sequence(lit(0L), expr(s"(img_w + ${patch - 1}) DIV $patch - 1"))))
      .withColumn("x", expr(s"patch_col * $patch"))
      .withColumn("y", expr(s"patch_row * $patch"))
      .withColumn("pw", expr(s"least($patch, img_w - x)"))
      .withColumn("ph", expr(s"least($patch, img_h - y)"))
  }

  /** Video (MP4/ISO-BMFF) metadata from the CANONICAL box layout — the
    * video sibling of [[withImageDims]]/[[withAudioMeta]], closing the
    * third modality (video is the dominant byte mass of a multimodal
    * corpus). The canonical layout — a 24-byte `ftyp` (brand `isom`)
    * followed by `moov` whose first child is a version-0 `mvhd` and a
    * first `trak` holding a version-0 `tkhd` — pins every field at a
    * constant offset in the first 240 bytes, so the parse is pure
    * relational column algebra inside whole-stage codegen (`substring`
    * + `hex` + `conv`), and a 100 TB scan materializes nothing beyond
    * the header slice. Anything else (64-bit largesize boxes, `free`
    * padding before `moov`, v1 headers, `mdat`-first streaming layout)
    * falls to 'unknown' here and to the per-row box walker [[mp4Meta]]
    * — exactly the [[withAudioMeta]]/[[wavMeta]] split.
    *
    * Adds `vfmt` ('mp4' | 'unknown'), `v_timescale` (mvhd units/sec),
    * `v_dur_units` (mvhd duration), `vid_w`/`vid_h` (tkhd 16.16 fixed
    * point → integer pixels), `vdur_us` = units·10⁶ DIV timescale
    * (0 timescale → NULL, never a divide error). All NULL unless the
    * canonical layout matched. */
  def withVideoMeta(assets: DataFrame,
                    contentCol: String = "content"): DataFrame = {
    val h = upper(hex(substring(col(contentCol), 1, 240)))
    def be32(bytePos: Int) =
      conv(substring(h, 2 * bytePos + 1, 8), 16, 10).cast("long")
    def tag(bytePos: Int, hexTag: String) =
      substring(h, 2 * bytePos + 1, 8) === hexTag
    val isMp4 =
      h.startsWith("000000186674797069736F6D") && // 24-byte ftyp, isom
        tag(28, "6D6F6F76") && // 'moov'
        tag(36, "6D766864") && // 'mvhd' first child
        substring(h, 2 * 40 + 1, 2) === "00" && // mvhd version 0
        be32(148) === 92L && tag(152, "746B6864") && // 92-byte 'tkhd'
        substring(h, 2 * 156 + 1, 2) === "00" // tkhd version 0
    val ts = be32(52)
    assets
      .withColumn("vfmt", when(isMp4, "mp4").otherwise("unknown"))
      .withColumn("v_timescale", when(isMp4, ts))
      .withColumn("v_dur_units", when(isMp4, be32(56)))
      .withColumn("__w1616", when(isMp4, be32(232)))
      .withColumn("__h1616", when(isMp4, be32(236)))
      .withColumn("vid_w", expr("__w1616 DIV 65536"))
      .withColumn("vid_h", expr("__h1616 DIV 65536"))
      .drop("__w1616", "__h1616")
      .withColumn("__ts", when(isMp4 && ts > 0, ts))
      .withColumn("vdur_us", expr("v_dur_units * 1000000 DIV __ts"))
      .drop("__ts")
  }

  /** ISO-BMFF box walker for NON-canonical MP4 files — the fallback
    * [[withVideoMeta]] sends to 'unknown': walks the top-level box list
    * (each header = BE u32 size + 4-char type; size 1 = 64-bit
    * largesize follows, size 0 = to end-of-file) to find `moov`
    * wherever it sits (behind `free`/`skip` padding, after `mdat` in
    * streaming layouts), then `moov`'s children for `mvhd` (v0 or v1)
    * and each `trak`'s `tkhd` (v0 or v1), taking the first track with a
    * nonzero width — audio tracks carry width 0, so that IS the video
    * track election. Per-row imperative by necessity (box offsets are
    * data-dependent — the [[jpegDims]]/[[wavMeta]] class; the
    * driver-OOM alternative, collecting boxes to the driver, is not an
    * alternative). Returns (timescale, durationUnits, width, height) or
    * None; a declared size past the buffer ends the walk (truncated
    * file) rather than overflowing. */
  def mp4Meta(content: Array[Byte]): Option[(Long, Long, Int, Int)] = {
    def u16(i: Int) = ((content(i) & 0xff) << 8) | (content(i + 1) & 0xff)
    def u32(i: Int): Long = mp4U32(content, i)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def boxes(from: Int, until: Int) = mp4Boxes(content, from, until)
    if (content.length < 8) return None
    boxes(0, content.length).collectFirst {
      case ("moov", off, end) =>
        var mvhd: Option[(Long, Long)] = None
        var dims: Option[(Int, Int)] = None
        boxes(off, end).foreach {
          case ("mvhd", b, e) if mvhd.isEmpty && b + 4 <= e =>
            val v = content(b) & 0xff
            if (v == 0 && b + 20 <= e) mvhd = Some((u32(b + 12), u32(b + 16)))
            else if (v == 1 && b + 32 <= e)
              mvhd = Some((u32(b + 20), u64(b + 24)))
          case ("trak", b, e) if dims.isEmpty =>
            boxes(b, e).foreach {
              case ("tkhd", tb, te) if dims.isEmpty && tb + 4 <= te =>
                val v = content(tb) & 0xff
                val wOff = if (v == 1) tb + 88 else tb + 76
                if (wOff + 8 <= te) {
                  val w = u16(wOff) // 16.16 fixed: integer part
                  val hgt = u16(wOff + 4)
                  if (w > 0) dims = Some((w, hgt))
                }
              case _ =>
            }
          case _ =>
        }
        for ((ts, dur) <- mvhd; (w, hgt) <- dims) yield (ts, dur, w, hgt)
    }.flatten
  }

  private def mp4U32(content: Array[Byte], i: Int): Long =
    ((content(i) & 0xffL) << 24) | ((content(i + 1) & 0xffL) << 16) |
      ((content(i + 2) & 0xffL) << 8) | (content(i + 3) & 0xffL)

  /** The shared [from, until) box-header walk of [[mp4Meta]], factored
    * for its table-reading sibling: (type, bodyOff, bodyEnd); size 1 =
    * 64-bit largesize, size 0 = to end; a declared size past the buffer
    * ends the walk (truncated file) rather than overflowing. */
  private def mp4Boxes(content: Array[Byte], from: Int,
                       until: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var i = from
      def hasNext: Boolean = i + 8 <= until
      def next(): (String, Int, Int) = {
        val declared = mp4U32(content, i)
        val t = new String(content.slice(i + 4, i + 8), "US-ASCII")
        val (bodyOff, size) =
          if (declared == 1L && i + 16 <= until)
            (i + 16, (mp4U32(content, i + 8) << 32) | mp4U32(content, i + 12))
          else if (declared == 0L) (i + 8, (until - i).toLong)
          else (i + 8, declared)
        val end =
          if (size < 8 || i + size > until) until // malformed/truncated
          else (i + size).toInt
        val r = (t, bodyOff, end)
        i = end
        r
      }
    }

  /** Absurd-count backstop for the sample tables: a corrupt header
    * declaring billions of entries must not allocate them — the real
    * bound is the box body size, checked first; this caps what a
    * size-0-to-EOF box could still claim. */
  private val MaxSampleEntries = 1 << 20

  /** `stsz`/`stco` sample tables — the byte-addressability data
    * [[videoSamplePlan]]'s doc names as the missing piece: walks
    * `moov` → each `trak` → `mdia` → `minf` → `stbl` and returns the
    * FIRST track carrying both tables as (sampleSizes, chunkOffsets).
    * Both `stsz` forms parse: the compact constant-size form
    * (sample_size ≠ 0: every sample that size, no table) and the
    * per-sample table (sample_size = 0). Same per-row-imperative
    * justification, truncation discipline, and None-on-malformed
    * contract as [[mp4Meta]]; entry counts are bounded by the box body
    * BEFORE any allocation. */
  def mp4SampleTables(content: Array[Byte])
      : Option[(Array[Long], Array[Long])] = {
    def u32(i: Int): Long = mp4U32(content, i)
    if (content.length < 8) return None
    def stblTables(sb: Int, se: Int): Option[(Array[Long], Array[Long])] = {
      var sizes: Option[Array[Long]] = None
      var offs: Option[Array[Long]] = None
      mp4Boxes(content, sb, se).foreach {
        case ("stsz", tb, te) if sizes.isEmpty && tb + 12 <= te =>
          val fixed = u32(tb + 4)
          val n = u32(tb + 8)
          if (n >= 0 && n <= MaxSampleEntries) {
            if (fixed != 0L)
              sizes = Some(Array.fill(n.toInt)(fixed))
            else if (tb + 12 + 4 * n <= te)
              sizes = Some(Array.tabulate(n.toInt)(i => u32(tb + 12 + 4 * i)))
          }
        case ("stco", tb, te) if offs.isEmpty && tb + 8 <= te =>
          val n = u32(tb + 4)
          if (n >= 0 && n <= MaxSampleEntries && tb + 8 + 4 * n <= te)
            offs = Some(Array.tabulate(n.toInt)(i => u32(tb + 8 + 4 * i)))
        case _ =>
      }
      for (s <- sizes; o <- offs) yield (s, o)
    }
    mp4Boxes(content, 0, content.length).collectFirst {
      case ("moov", off, end) =>
        var found: Option[(Array[Long], Array[Long])] = None
        mp4Boxes(content, off, end).foreach {
          case ("trak", b, e) if found.isEmpty =>
            mp4Boxes(content, b, e).foreach {
              case ("mdia", mb, me) if found.isEmpty =>
                mp4Boxes(content, mb, me).foreach {
                  case ("minf", nb, ne) if found.isEmpty =>
                    mp4Boxes(content, nb, ne).foreach {
                      case ("stbl", sb, se) if found.isEmpty =>
                        found = stblTables(sb, se)
                      case _ =>
                    }
                  case _ =>
                }
              case _ =>
            }
          case _ =>
        }
        found
    }.flatten
  }

  /** Sample tables as columns: `sample_sizes` / `chunk_offs`
    * (`array<bigint>`, NULL when the container carries no parseable
    * stsz+stco pair). The walker is the justified per-row-imperative
    * class ([[mp4Meta]]'s argument); at 100 TB this still moves one
    * metadata row per asset — the tables are KB-sized headers, never
    * media bytes. */
  def withSampleTables(assets: DataFrame,
                       contentCol: String = "content"): DataFrame = {
    val f = org.apache.spark.sql.functions.udf(
      (b: Array[Byte]) =>
        if (b == null) None
        else mp4SampleTables(b).map { case (s, o) => (s.toSeq, o.toSeq) })
    assets
      .withColumn("__st", f(col(contentCol)))
      .withColumn("sample_sizes", col("__st._1"))
      .withColumn("chunk_offs", col("__st._2"))
      .drop("__st")
  }

  /** Decoder batch plan over parsed CANONICAL MP4 assets
    * ([[withVideoMeta]]'s output) — the video sibling of
    * [[audioWindowPlan]]: fixed `sampleEveryMs` sampling instants, one
    * row per instant with the TIME range a decode UDF seeks
    * (`sample_idx`, `t_off_us`, `t_len_us`; the last range truncates to
    * the duration, non-mp4 rows drop) PLUS, when the meta frame carries
    * [[withSampleTables]]'s columns, the TRUE byte range
    * (`byte_off`/`byte_len` from `stco`/`stsz` — a ranged GET, the
    * audio plan's discipline) — NULL for tableless containers, where
    * the time-indexed seek the decode stage (ffmpeg-class, stubbed
    * here: no codecs in the container) exposes remains the honest
    * unit. Same 100 TB discipline as q189: the planner moves one
    * metadata row per sample and never a media byte; pure nonnegative
    * integer math the oracle replays. */
  def videoSamplePlan(meta: DataFrame, sampleEveryMs: Int): DataFrame = {
    require(sampleEveryMs > 0, s"videoSamplePlan: sampleEveryMs=$sampleEveryMs")
    val step = sampleEveryMs * 1000L
    val base = meta.filter(col("vfmt") === "mp4" && col("vdur_us") > 0)
      .withColumn("sample_idx",
        explode(sequence(lit(0L), expr(s"(vdur_us + ${step - 1}) DIV $step - 1"))))
      .withColumn("t_off_us", expr(s"sample_idx * $step"))
      .withColumn("t_len_us", expr(s"least($step, vdur_us - t_off_us)"))
    // TRUE byte ranges when the sample tables rode in
    // ([[withSampleTables]]): the instant maps to its sample index by
    // uniform timing over the track (j = t·n DIV dur — the stts-less
    // approximation, stated; a decode stage with stts refines it), and
    // the range is that sample's (chunk_offset, size). Tableless
    // containers keep NULL byte columns — the time-seek fallback the
    // previous contract documented. Overflow guard: a corrupt-but-
    // parseable header (u32 duration at timescale 1 gives vdur_us up
    // to ~4.3e15; MaxSampleEntries allows n up to 2^20) can push the
    // INTERMEDIATE product t·n past Long range even though the true
    // quotient is always < n (t < dur) — under ANSI that's a runtime
    // error, pre-ANSI a negative index. `try_multiply` turns the
    // overflow into NULL and the index falls back to the same ratio
    // in double precision (j error ~1e-10 at these magnitudes — an
    // off-by-one sample on an already-degenerate header at worst),
    // then clamps to [0, n-1] so element_at stays in range.
    if (!meta.columns.contains("sample_sizes")) base
    else {
      val n = size(col("sample_sizes"))
      val ok = col("sample_sizes").isNotNull && col("chunk_offs").isNotNull &&
        n > 0 && size(col("chunk_offs")) === n
      base
        .withColumn("__j", when(ok,
          expr("least(greatest(coalesce(" +
            "try_multiply(t_off_us, CAST(size(sample_sizes) AS BIGINT))" +
            " DIV vdur_us, " +
            "CAST(floor((CAST(t_off_us AS DOUBLE) / vdur_us)" +
            " * size(sample_sizes)) AS BIGINT)), 0L)," +
            " CAST(size(sample_sizes) - 1 AS BIGINT))").cast("int")))
        .withColumn("byte_off", element_at(col("chunk_offs"), col("__j") + 1))
        .withColumn("byte_len", element_at(col("sample_sizes"), col("__j") + 1))
        .drop("__j")
    }
  }

  /** Decoder batch plan over parsed CANONICAL WAV assets
    * ([[withAudioMeta]]'s output — data chunk at byte 44 by that
    * parser's own match rule): fixed-length windows of `winMs`
    * milliseconds hopped every `hopMs`, one row per window with the
    * exact byte range a decode UDF reads —
    * `(…, window_idx, sample_off, n_samples, byte_off, byte_len)`; the
    * last window truncates to the data end. Non-wav rows drop.
    *
    * This is the 100 TB multimodal discipline: the PLANNER moves only
    * metadata (one row per window, integer arithmetic on header
    * fields); the bytes themselves are range-read by the decode stage
    * from the object store (`byte_off`/`byte_len` map directly to a
    * ranged GET), so a corpus of hour-long recordings plans without a
    * single audio byte crossing a shuffle. Pure nonnegative integer
    * math end to end — the oracle replays it exactly. */
  def audioWindowPlan(meta: DataFrame, winMs: Int, hopMs: Int): DataFrame = {
    require(winMs > 0 && hopMs > 0,
      s"audioWindowPlan: winMs=$winMs hopMs=$hopMs")
    meta.filter(col("afmt") === "wav")
      .withColumn("__blk", expr("channels * bits DIV 8"))
      .filter(col("__blk") > 0)
      .withColumn("__n", expr("data_bytes DIV __blk"))
      .filter(col("__n") > 0)
      .withColumn("__win",
        greatest(expr(s"sample_rate_hz * $winMs DIV 1000"), lit(1L)))
      .withColumn("__hop",
        greatest(expr(s"sample_rate_hz * $hopMs DIV 1000"), lit(1L)))
      .withColumn("window_idx",
        explode(sequence(lit(0L), expr("(__n + __hop - 1) DIV __hop - 1"))))
      .withColumn("sample_off", expr("window_idx * __hop"))
      .withColumn("n_samples", expr("least(__win, __n - sample_off)"))
      .withColumn("byte_off", expr("44 + sample_off * __blk"))
      .withColumn("byte_len", expr("n_samples * __blk"))
      .drop("__blk", "__n", "__win", "__hop")
  }
}

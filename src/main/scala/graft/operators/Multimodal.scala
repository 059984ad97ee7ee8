package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, and decode / feature-extract /
  * frame-sample stages as partition-wise typed transforms.
  *
  * The Spark-side design is the real deliverable here and is fully
  * exercised: schema (binary payload + metadata struct), partition
  * batching (`mapPartitions` over a typed Dataset — the Scala
  * equivalent of `mapInPandas`: one iterator per partition so a codec
  * can amortize per-batch init), and the column contracts each stage
  * consumes/produces. Four codecs ride the single `MediaCodec` seam,
  * every one a REAL from-spec parser: [[BmpCodec]] (24bpp BI_RGB
  * Windows BMP, gate-checked via `mm_image`), the PNG decoder (zlib
  * inflate + scanline unfiltering, via `mm_png`), [[WavCodec]]
  * (RIFF/WAVE 16-bit PCM, via `mm_audio`), and [[AviCodec]] (RIFF/AVI
  * container demux — headers, movi walk, idx1 cross-validation — via
  * `mm_video`). Frame PIXEL decode inside the AVI would need ffmpeg
  * (absent here); a JNI codec swaps in at the same seam.
  * [[DispatchCodec]] routes by kind, so the decode stage's gate
  * exercises real parsers on all three branches.
  *
  * At 100 TB: binary payloads dominate row size, so stages that don't
  * need the payload must prune it (`decoded.drop("media")` happens at
  * the scan thanks to nested pruning); feature extraction is
  * shuffle-free; the only exchange in the pipeline is whatever
  * downstream analytics (e.g. ANN over the features) introduces.
  */
object Multimodal {

  /** One media row: payload + the typed metadata every stage shares. */
  final case class MediaRow(doc_id: Long, media: Array[Byte],
                            kind: String, n_bytes: Int)
  /** Decoded/para-extracted record: fixed-width feature vector +
    * sampled frame offsets (video) — payload dropped. */
  final case class MediaFeatures(doc_id: Long, kind: String,
                                 width: Int, height: Int,
                                 features: Array[Float],
                                 frame_offsets: Array[Int])

  /** The codec seam. Implementations parse the payload bytes into the
    * uniform [[MediaFeatures]] record; a production deployment wraps
    * libjpeg/ffmpeg here with per-partition init. */
  trait MediaCodec extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** REAL video-container codec through the same seam — RIFF/AVI per
    * the published AVI 1.0 container format ([[aviParse]]). Dimensions
    * come out of the `avih` main header (cross-checked against the
    * stream's BITMAPINFOHEADER), fps out of the `strh`
    * dwRate/dwScale pair, and `frame_offsets` are the REAL absolute
    * payload positions of each `00dc` frame chunk — the container
    * walk AND the `idx1` index must agree on them or decode rejects.
    * Frame PIXEL decode (the codec inside the container) would need
    * ffmpeg, which this environment lacks; everything a container
    * demuxer does is real. */
  object AviCodec extends MediaCodec {
    def decode(r: MediaRow): MediaFeatures = {
      val m = aviParse(r.doc_id, r.media)
      val n = m.frames.length
      val fps = m.rate.toFloat / m.scale
      var sumSz = 0L; var minSz = Int.MaxValue; var maxSz = 0
      var k = 0
      while (k < n) {
        val s = m.frames(k).size
        sumSz += s; if (s < minSz) minSz = s; if (s > maxSz) maxSz = s
        k += 1
      }
      val features = Array(fps, n.toFloat, sumSz.toFloat, minSz.toFloat,
        maxSz.toFloat, n / fps, m.usecPerFrame.toFloat)
      // absolute payload offsets: chunk position (relative to the
      // 'movi' fourcc, as idx1 records them) + fourcc position + the
      // 8-byte chunk header
      val offsets = m.frames.map(f => m.moviFcc + f.relOff + 8)
      MediaFeatures(r.doc_id, r.kind, m.width, m.height, features, offsets)
    }
  }

  /** REAL image codec through the same seam — Windows BMP, 24bpp
    * uncompressed BI_RGB (BITMAPFILEHEADER + BITMAPINFOHEADER per the
    * published format: little-endian fields, BGR byte order, rows
    * bottom-up unless height < 0, each row padded to a 4-byte
    * boundary). Dependency-free and deterministic, so the decode
    * stage is oracle-checkable end-to-end: a format error (stride,
    * flip, channel order, header offset) corrupts the pixel sums and
    * the hash gate catches it. Features are channel/region means in
    * [0,1] — region means (top half, left half) are ORDER-SENSITIVE,
    * pinning row direction and stride, where whole-image means alone
    * would be permutation-blind. */
  object BmpCodec extends MediaCodec {
    def decode(r: MediaRow): MediaFeatures = {
      val st = bmpStats(r.doc_id, r.media)
      val n = st.width.toLong * st.height
      val topN = (st.height / 2).toLong * st.width
      val leftN = (st.width / 2).toLong * st.height
      // height/width 1 make a half-image region EMPTY (topN/leftN =
      // 0); its mean is defined as 0 rather than 0/0 = NaN, which
      // would silently poison downstream cosine/ANN math
      // (code-review r10)
      def regionMean(sum: Long, cnt: Long): Float =
        if (cnt == 0) 0f else (sum.toDouble / (cnt * 3 * 255)).toFloat
      val features = Array(
        (st.sum_r.toDouble / (n * 255)).toFloat,
        (st.sum_g.toDouble / (n * 255)).toFloat,
        (st.sum_b.toDouble / (n * 255)).toFloat,
        regionMean(st.sum_top, topN),
        regionMean(st.sum_left, leftN),
        ((st.sum_r + st.sum_g + st.sum_b).toDouble / (n * 3 * 255)).toFloat)
      MediaFeatures(r.doc_id, r.kind, st.width, st.height, features,
        Array.empty[Int])
    }
  }

  /** REAL audio codec through the [[MediaCodec]] seam: [[wavStats]]'
    * RIFF/WAVE chunk walk, repackaged as the uniform [[MediaFeatures]]
    * record. Audio has no spatial dims, so the two metadata ints
    * carry (sample_rate, n_samples) — documented mapping, pinned by
    * the `mm_decode` oracle, which derives both from the container
    * the decoder must actually parse. Features are the five
    * normalized sample statistics. */
  object WavCodec extends MediaCodec {
    def decode(r: MediaRow): MediaFeatures = {
      val st = wavStats(r.doc_id, r.media)
      val n = math.max(1, st.n_samples)
      // a zero-length data chunk is a VALID container: the sum
      // features are 0 via the n guard, but max_s is the Int.MinValue
      // sentinel and must not leak ~-1e6 into the feature vector
      // (BmpCodec's empty-region 0f rule, same hazard class)
      val maxF = if (st.n_samples == 0) 0f else (st.max_s / 2048.0).toFloat
      val features = Array(
        (st.sum_s.toDouble / n / 2048.0).toFloat,
        (st.sum_abs.toDouble / n / 2048.0).toFloat,
        (math.sqrt(st.sum_sq.toDouble / n) / 2048.0).toFloat,
        (st.sum_first_half.toDouble / n / 2048.0).toFloat,
        maxF)
      MediaFeatures(r.doc_id, r.kind, st.sample_rate, st.n_samples,
        features, Array.empty[Int])
    }
  }

  /** Kind-dispatching codec — the production shape of the decode
    * stage: REAL dependency-free parsers on every branch (BMP images,
    * RIFF/WAVE audio, RIFF/AVI video containers). One seam,
    * per-partition instantiation unchanged. */
  object DispatchCodec extends MediaCodec {
    def decode(r: MediaRow): MediaFeatures = r.kind match {
      case "image" => BmpCodec.decode(r)
      case "audio" => WavCodec.decode(r)
      case "video" => AviCodec.decode(r)
      case k => throw new IllegalArgumentException(
        s"doc ${r.doc_id}: unknown media kind '$k'")
    }
  }

  /** Exact integer pixel sums from a decoded BMP — the hash-gate
    * payload (integer arithmetic end to end: no float rounding knife
    * edges between Spark and the DuckDB restatement). */
  final case class BmpStats(doc_id: Long, width: Int, height: Int,
                            sum_r: Long, sum_g: Long, sum_b: Long,
                            sum_top: Long, sum_left: Long)

  /** The ONE pixel-sum kernel both image gates share: (sum_r, sum_g,
    * sum_b, top-half sum, left-half sum) over a top-down row-major
    * RGB surface. Both codecs' oracles restate exactly this
    * arithmetic, so keeping a single body removes the risk of the
    * two gates' half-image conventions drifting apart
    * (code-review r10). */
  private def pixelSums(w: Int, h: Int,
                        px: Array[Int]): (Long, Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L; var sTop = 0L; var sLeft = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        val r = px(o); val g = px(o + 1); val b = px(o + 2)
        sr += r; sg += g; sb += b
        if (y < h / 2) sTop += r + g + b
        if (x < w / 2) sLeft += r + g + b
        x += 1
      }
      y += 1
    }
    (sr, sg, sb, sTop, sLeft)
  }

  private[graft] def bmpStats(docId: Long, d: Array[Byte]): BmpStats = {
    val (w, h, px) = bmpPixels(docId, d)
    val (sr, sg, sb, sTop, sLeft) = pixelSums(w, h, px)
    BmpStats(docId, w, h, sr, sg, sb, sTop, sLeft)
  }

  /** Decode a 24bpp BI_RGB BMP to a TOP-DOWN row-major RGB pixel
    * array (normalizes bottom-up/top-down row order, stride padding,
    * and BGR byte order — the three spots a shortcut decoder breaks). */
  private[graft] def bmpPixels(docId: Long,
                               d: Array[Byte]): (Int, Int, Array[Int]) = {
    require(d.length >= 54 && d(0) == 'B'.toByte && d(1) == 'M'.toByte,
      s"doc $docId: not a BMP")
    def u16(o: Int): Int = (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
    def i32(o: Int): Int = (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8) |
      ((d(o + 2) & 0xff) << 16) | ((d(o + 3) & 0xff) << 24)
    val pixOff = i32(10)
    val w = i32(18)
    val hRaw = i32(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    require(u16(28) == 24 && i32(30) == 0,
      s"doc $docId: only 24bpp BI_RGB supported (bpp=${u16(28)})")
    // declared geometry must FIT the payload: a truncated or
    // header-corrupt file previously crashed with a bare
    // ArrayIndexOutOfBounds instead of the descriptive reject every
    // other malformation gets (code-review r10)
    require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20),
      s"doc $docId: bad dimensions ${w}x$hRaw")
    val stride = ((w * 3 + 3) / 4) * 4
    require(pixOff >= 54 && pixOff.toLong + stride.toLong * h <= d.length,
      s"doc $docId: truncated BMP (need ${pixOff.toLong + stride.toLong * h} bytes, have ${d.length})")
    val px = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      val fileRow = if (topDown) y else h - 1 - y
      val rowOff = pixOff + fileRow * stride
      var x = 0
      while (x < w) {
        val o = rowOff + x * 3
        val t = (y * w + x) * 3
        px(t) = d(o + 2) & 0xff     // R (file order is BGR)
        px(t + 1) = d(o + 1) & 0xff // G
        px(t + 2) = d(o) & 0xff     // B
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** Exact integer sample sums from a decoded WAV — the audio
    * analogue of [[BmpStats]] (integer arithmetic end to end).
    * `sum_first_half` is ORDER-SENSITIVE (pins sample order and
    * little-endian 16-bit decode where whole-signal sums alone would
    * be permutation-blind). */
  final case class WavStats(doc_id: Long, sample_rate: Int, n_samples: Int,
                            sum_s: Long, sum_abs: Long, sum_sq: Long,
                            sum_first_half: Long, max_s: Int)

  /** REAL audio codec through the same partition-wise seam — RIFF/
    * WAVE, 16-bit mono PCM per the published container format: walks
    * the chunk list (id + le32 size, bodies padded to even length —
    * the rule a fixed-offset-44 "parser" silently breaks on any file
    * with an extra chunk), requires `fmt ` before `data`, rejects
    * compressed / multi-channel / non-16-bit streams rather than
    * misreading them. Samples are little-endian SIGNED 16-bit: the
    * sign-extension path is pinned by negative closed-form samples. */
  private[graft] def wavStats(docId: Long, d: Array[Byte]): WavStats = {
    def str4(o: Int) = new String(d, o, 4, "US-ASCII")
    def u16(o: Int): Int = (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
    def i32(o: Int): Int = (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8) |
      ((d(o + 2) & 0xff) << 16) | ((d(o + 3) & 0xff) << 24)
    require(d.length >= 12 && str4(0) == "RIFF" && str4(8) == "WAVE",
      s"doc $docId: not a RIFF/WAVE container")
    var off = 12
    var rate = -1
    var st: WavStats = null
    while (off + 8 <= d.length && st == null) {
      val id = str4(off); val size = i32(off + 4); val body = off + 8
      // the declared chunk body must FIT the payload — a size field
      // larger than the remaining bytes previously read past the
      // array end with a bare AIOOBE instead of the descriptive
      // reject every other malformation gets (code-review r10)
      require(size >= 0 && body.toLong + size <= d.length,
        s"doc $docId: truncated '$id' chunk (size=$size, have ${d.length - body})")
      id match {
        case "fmt " =>
          require(u16(body) == 1 && u16(body + 2) == 1 && u16(body + 14) == 16,
            s"doc $docId: only 16-bit mono PCM supported " +
              s"(fmt=${u16(body)} ch=${u16(body + 2)} bits=${u16(body + 14)})")
          rate = i32(body + 4)
        case "data" =>
          require(rate > 0, s"doc $docId: data chunk before fmt")
          val n = size / 2
          var sum = 0L; var sAbs = 0L; var sSq = 0L; var sFirst = 0L
          var mx = Int.MinValue
          var i = 0
          while (i < n) {
            val o = body + i * 2
            // low byte unsigned | high byte sign-extended = signed 16-bit
            val s = (d(o) & 0xff) | (d(o + 1).toInt << 8)
            sum += s; sAbs += math.abs(s); sSq += s.toLong * s
            if (i < n / 2) sFirst += s
            if (s > mx) mx = s
            i += 1
          }
          st = WavStats(docId, rate, n, sum, sAbs, sSq, sFirst, mx)
        case _ => () // unknown chunk (JUNK/LIST/...): skip
      }
      off = body + size + (size & 1) // RIFF: chunk bodies pad to even
    }
    require(st != null, s"doc $docId: no data chunk")
    st
  }

  /** One demuxed frame chunk: offset of its `00dc` fourcc RELATIVE to
    * the `movi` list fourcc (the idx1 convention), declared payload
    * size, and the exact sum of its payload bytes. */
  private[graft] final case class AviFrame(relOff: Int, size: Int,
                                           byteSum: Long)

  /** Everything a container demux yields before pixel decode: stream
    * geometry + timing out of the headers, the absolute position of
    * the `movi` fourcc (the base idx1 offsets are relative to), and
    * the per-frame chunk table. */
  private[graft] final case class AviMeta(width: Int, height: Int,
                                          rate: Int, scale: Int,
                                          usecPerFrame: Int, moviFcc: Int,
                                          frames: Array[AviFrame])

  /** REAL RIFF/AVI container demuxer per the published AVI 1.0 format
    * — the same little-endian chunk discipline as [[wavStats]]
    * (id + le32 size, bodies padded to even length), plus everything
    * AVI adds on top: NESTED `LIST` chunks (`hdrl` holding `avih` and
    * a `LIST strl` per stream; `movi` holding the frame chunks), the
    * fixed-layout `avih`/`strh`/`strf` headers, two-digit stream-id
    * frame fourccs (`00dc`/`00db`), and the trailing `idx1` index
    * whose entries are offsets relative to the `movi` fourcc.
    *
    * The demux is SELF-VALIDATING three ways a shortcut parser is
    * not: (a) `avih.dwTotalFrames`, `strh.dwLength`, the walked movi
    * chunk count, and the idx1 entry count must all agree; (b) every
    * idx1 entry's (ckid, offset, size) must match the chunk the movi
    * walk actually found at that position; (c) `strf`'s
    * BITMAPINFOHEADER dims must match `avih`'s. A one-byte layout
    * error anywhere breaks one of the three. */
  private[graft] def aviParse(docId: Long, d: Array[Byte]): AviMeta = {
    def str4(o: Int) = new String(d, o, 4, "US-ASCII")
    def u16(o: Int): Int = (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
    def i32(o: Int): Int = (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8) |
      ((d(o + 2) & 0xff) << 16) | ((d(o + 3) & 0xff) << 24)
    require(d.length >= 12 && str4(0) == "RIFF" && str4(8) == "AVI ",
      s"doc $docId: not a RIFF/AVI container")
    var w = -1; var h = -1; var rate = -1; var scale = -1; var usec = -1
    var totalFrames = -1; var strhLen = -1
    var moviFcc = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[AviFrame]
    var idx1: Array[(String, Int, Int)] = null

    def walkStrl(start: Int, end: Int): Unit = {
      var o = start
      while (o + 8 <= end) {
        val id = str4(o); val sz = i32(o + 4); val b = o + 8
        require(sz >= 0 && b.toLong + sz <= end,
          s"doc $docId: truncated '$id' in strl (size=$sz)")
        id match {
          case "strh" =>
            require(sz >= 56, s"doc $docId: short strh ($sz)")
            // only the FIRST stream is consumed; a real multi-stream
            // file would dispatch on fccType per strl
            require(str4(b) == "vids",
              s"doc $docId: first stream is '${str4(b)}', expected vids")
            scale = i32(b + 20); rate = i32(b + 24); strhLen = i32(b + 32)
          case "strf" =>
            require(sz >= 40, s"doc $docId: short strf ($sz)")
            require(i32(b + 4) == w && i32(b + 8) == h,
              s"doc $docId: strf dims ${i32(b + 4)}x${i32(b + 8)} " +
                s"!= avih ${w}x$h")
            require(u16(b + 14) == 24,
              s"doc $docId: only 24bpp DIB streams supported")
          case _ => () // JUNK/vprp/...: skip
        }
        o = b + sz + (sz & 1)
      }
    }
    def walkHdrl(start: Int, end: Int): Unit = {
      var o = start
      while (o + 8 <= end) {
        val id = str4(o); val sz = i32(o + 4); val b = o + 8
        require(sz >= 0 && b.toLong + sz <= end,
          s"doc $docId: truncated '$id' in hdrl (size=$sz)")
        id match {
          case "avih" =>
            require(sz >= 56, s"doc $docId: short avih ($sz)")
            usec = i32(b); totalFrames = i32(b + 16)
            w = i32(b + 32); h = i32(b + 36)
            require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20),
              s"doc $docId: bad dimensions ${w}x$h")
          case "LIST" if sz >= 4 && str4(b) == "strl" =>
            walkStrl(b + 4, b + sz)
          case _ => ()
        }
        o = b + sz + (sz & 1)
      }
    }

    var off = 12
    while (off + 8 <= d.length) {
      val id = str4(off); val size = i32(off + 4); val body = off + 8
      require(size >= 0 && body.toLong + size <= d.length,
        s"doc $docId: truncated '$id' chunk (size=$size, " +
          s"have ${d.length - body})")
      id match {
        case "LIST" =>
          require(size >= 4, s"doc $docId: short LIST ($size)")
          str4(body) match {
            case "hdrl" => walkHdrl(body + 4, body + size)
            case "movi" =>
              moviFcc = body
              var o = body + 4
              val end = body + size
              while (o + 8 <= end) {
                val cid = str4(o); val sz = i32(o + 4); val b = o + 8
                require(sz >= 0 && b.toLong + sz <= end,
                  s"doc $docId: truncated movi chunk '$cid' (size=$sz)")
                // ##dc (compressed) / ##db (uncompressed) video frame
                // of stream ##; other streams' chunks (##wb audio,
                // rec  lists) are skipped by the same walk
                if (cid(0).isDigit && cid(1).isDigit &&
                  (cid.endsWith("dc") || cid.endsWith("db"))) {
                  var s = 0L; var t = 0
                  while (t < sz) { s += (d(b + t) & 0xff); t += 1 }
                  frames += AviFrame(o - moviFcc, sz, s)
                }
                o = b + sz + (sz & 1)
              }
            case _ => () // INFO/...: skip
          }
        case "idx1" =>
          require(size % 16 == 0, s"doc $docId: ragged idx1 ($size)")
          idx1 = Array.tabulate(size / 16) { k =>
            val e = body + k * 16
            (str4(e), i32(e + 8), i32(e + 12))
          }
        case _ => () // JUNK/...: skip
      }
      off = body + size + (size & 1)
    }
    require(w > 0, s"doc $docId: no avih header")
    require(scale > 0 && rate > 0, s"doc $docId: no vids stream header")
    require(moviFcc >= 0 && frames.nonEmpty, s"doc $docId: no movi frames")
    require(idx1 != null, s"doc $docId: no idx1 index")
    require(totalFrames == frames.length && strhLen == frames.length &&
      idx1.length == frames.length,
      s"doc $docId: frame count mismatch (avih=$totalFrames " +
        s"strh=$strhLen movi=${frames.length} idx1=${idx1.length})")
    var k = 0
    while (k < frames.length) {
      val (ck, ro, sz) = idx1(k)
      require(ck == "00dc" && ro == frames(k).relOff && sz == frames(k).size,
        s"doc $docId: idx1[$k] ($ck@$ro+$sz) disagrees with movi walk " +
          s"(00dc@${frames(k).relOff}+${frames(k).size})")
      k += 1
    }
    AviMeta(w, h, rate, scale, usec, moviFcc, frames.toArray)
  }

  /** Exact integer demux facts from a parsed AVI — the video analogue
    * of [[BmpStats]]/[[WavStats]] (integer arithmetic end to end).
    * `sum_rel_offsets` pins the whole chunk-layout arithmetic (header
    * sizes, even-padding, per-frame strides); `sum_bytes` pins that
    * payloads were read at exactly the right positions (a misaligned
    * walk shifts every byte formula). */
  final case class AviStats(doc_id: Long, width: Int, height: Int,
                            n_frames: Int, rate: Int, sum_sizes: Long,
                            sum_rel_offsets: Long, sum_bytes: Long,
                            first_off: Int, last_off: Int)

  private[graft] def aviStats(docId: Long, d: Array[Byte]): AviStats = {
    val m = aviParse(docId, d)
    var sumSz = 0L; var sumOff = 0L; var sumB = 0L
    var k = 0
    while (k < m.frames.length) {
      val f = m.frames(k)
      sumSz += f.size; sumOff += f.relOff; sumB += f.byteSum
      k += 1
    }
    AviStats(docId, m.width, m.height, m.frames.length, m.rate / m.scale,
      sumSz, sumOff, sumB, m.frames.head.relOff, m.frames.last.relOff)
  }

  /** Closed-form test clip: geometry, fps, frame count, frame sizes,
    * and every payload byte are formulas in (doc_id, frame, byte), so
    * the DuckDB oracle recomputes the whole demux result codec-free.
    * Layout hazards on the gate: an odd-sized JUNK chunk before the
    * movi list (fixed-offset parsers land mid-chunk), odd FRAME sizes
    * (the movi walk must apply even-padding between frames or every
    * later offset shifts), and idx1 offsets that must equal the
    * walked positions. */
  private[graft] def encodeAvi(docId: Long): Array[Byte] = {
    val n = 4 + (docId % 6).toInt
    val w = 16 + (docId % 8).toInt * 4
    val h = 12 + (docId % 5).toInt * 4
    val rate = 24 + (docId % 3).toInt * 6
    val j = 5 + (docId % 4).toInt              // 5..8: odd exercises padding
    val szs = Array.tabulate(n)(k => 24 + ((docId * 7 + k * 13) % 17).toInt)
    val moviData = 4 + szs.map(s => 8 + s + (s & 1)).sum
    val total = 12 + 200 + (8 + j + (j & 1)) + (8 + moviData) + (8 + 16 * n)
    val out = new Array[Byte](total)
    var o = 0
    def pStr(s: String): Unit = { s.foreach { c => out(o) = c.toByte; o += 1 } }
    def p16(v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte; o += 2 }
    def p32(v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte; o += 4
    }
    pStr("RIFF"); p32(total - 8); pStr("AVI ")
    pStr("LIST"); p32(192); pStr("hdrl")
    pStr("avih"); p32(56)
    p32(1000000 / rate); p32(0); p32(0); p32(0x10) // AVIF_HASINDEX
    p32(n); p32(0); p32(1); p32(0)
    p32(w); p32(h); p32(0); p32(0); p32(0); p32(0)
    pStr("LIST"); p32(116); pStr("strl")
    pStr("strh"); p32(56)
    pStr("vids"); pStr("DIB "); p32(0); p16(0); p16(0); p32(0)
    p32(1); p32(rate); p32(0); p32(n); p32(0); p32(0); p32(0)
    p16(0); p16(0); p16(w); p16(h)
    pStr("strf"); p32(40)
    p32(40); p32(w); p32(h); p16(1); p16(24); p32(0); p32(0)
    p32(0); p32(0); p32(0); p32(0)
    pStr("JUNK"); p32(j)                        // header carries UNPADDED size
    var t = 0
    while (t < j) { out(o) = ((docId + t) % 256).toByte; o += 1; t += 1 }
    if ((j & 1) == 1) { out(o) = 0; o += 1 }
    val moviStart = o
    pStr("LIST"); p32(moviData); pStr("movi")
    val rel = new Array[Int](n)
    var k = 0
    while (k < n) {
      rel(k) = o - (moviStart + 8)
      pStr("00dc"); p32(szs(k))
      var tt = 0
      while (tt < szs(k)) {
        out(o) = ((docId * 11 + k * 17 + tt * 5) % 251).toByte; o += 1; tt += 1
      }
      if ((szs(k) & 1) == 1) { out(o) = 0; o += 1 }
      k += 1
    }
    pStr("idx1"); p32(16 * n)
    k = 0
    while (k < n) {
      pStr("00dc"); p32(0x10); p32(rel(k)); p32(szs(k)) // AVIIF_KEYFRAME
      k += 1
    }
    out
  }

  /** Media table of REAL encoded video containers: one closed-form
    * AVI per 7th document id (the per-byte oracle crosses each doc
    * with its frame×byte grid, so the subset keeps the DuckDB side
    * decade-scalable), built executor-side like [[bmpTable]]. */
  def aviTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
      .filter(_ % 7 == 0)
      .mapPartitions(_.map { id =>
        val b = encodeAvi(id)
        MediaRow(id, b, "video", b.length)
      })
      .toDF()
  }

  /** Closed-form test clip: length/rate from the doc id, samples
    * linear in (doc_id, i) and SIGNED (range [-2048, 2047]) so the
    * DuckDB oracle recomputes them codec-free and sign extension is
    * on the line. An odd-sized JUNK chunk sits between `fmt ` and
    * `data`, so a decoder that assumes data-at-44 or skips the
    * even-padding rule lands mid-chunk and the hash gate catches it. */
  private[graft] def encodeWav(docId: Long): Array[Byte] = {
    val n = 50 + (docId % 32).toInt
    val rate = 8000 + (docId % 4).toInt * 4000
    val junkSize = 3 + (docId % 2).toInt       // 3 or 4: odd exercises padding
    val junkPadded = junkSize + (junkSize & 1)
    val dataSize = n * 2
    val riffSize = 4 + (8 + 16) + (8 + junkPadded) + (8 + dataSize)
    val out = new Array[Byte](8 + riffSize)
    var o = 0
    def pStr(s: String): Unit = { s.foreach { c => out(o) = c.toByte; o += 1 } }
    def p16(v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte; o += 2 }
    def p32(v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte; o += 4
    }
    pStr("RIFF"); p32(riffSize); pStr("WAVE")
    pStr("fmt "); p32(16)
    p16(1); p16(1); p32(rate); p32(rate * 2); p16(2); p16(16)
    pStr("JUNK"); p32(junkSize)                 // header carries UNPADDED size
    var j = 0
    while (j < junkSize) { out(o) = ((docId + j) % 256).toByte; o += 1; j += 1 }
    if ((junkSize & 1) == 1) { out(o) = 0; o += 1 }
    pStr("data"); p32(dataSize)
    var i = 0
    while (i < n) {
      p16(((docId * 37 + i * 11) % 4096).toInt - 2048)
      i += 1
    }
    out
  }

  /** Media table of REAL encoded audio clips: one closed-form WAV per
    * document id, built executor-side like [[bmpTable]]. */
  def wavTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val b = encodeWav(id)
        MediaRow(id, b, "audio", b.length)
      })
      .toDF()
  }

  /** Closed-form test image: dims from the doc id (widths 5..8 —
    * three of four NOT multiples of 4, so row padding is exercised),
    * pixel channels linear in (doc_id, x, y) so the DuckDB oracle
    * recomputes them without any codec. Encoded as a spec-conformant
    * bottom-up 24bpp BMP. */
  private[graft] def encodeBmp(docId: Long): Array[Byte] = {
    val w = 5 + (docId % 4).toInt
    val h = 3 + (docId % 3).toInt
    val px = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        px(o) = ((docId * 31 + x * 7 + y * 13) % 256).toInt     // R
        px(o + 1) = ((docId * 17 + x * 11 + y * 5) % 256).toInt // G
        px(o + 2) = ((docId * 23 + x * 3 + y * 19) % 256).toInt // B
        x += 1
      }
      y += 1
    }
    bmpFromPixels(w, h, px)
  }

  /** Encode a top-down row-major RGB surface as a real 24bpp BI_RGB
    * BMP: little-endian headers, bottom-up row order, BGR byte order,
    * rows padded to 4-byte boundaries. */
  private[graft] def bmpFromPixels(w: Int, h: Int,
                                   px: Array[Int]): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val dataSize = stride * h
    val out = new Array[Byte](54 + dataSize)
    def p16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def p32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    p32(2, 54 + dataSize); p32(10, 54)
    p32(14, 40); p32(18, w); p32(22, h)
    p16(26, 1); p16(28, 24); p32(30, 0); p32(34, dataSize)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        val o = rowOff + x * 3
        val t = (y * w + x) * 3
        out(o) = px(t + 2).toByte     // B
        out(o + 1) = px(t + 1).toByte // G
        out(o + 2) = px(t).toByte     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Exact integer pixel sums from a decoded PNG — same gate payload
    * shape as [[BmpStats]]. */
  final case class PngStats(doc_id: Long, width: Int, height: Int,
                            sum_r: Long, sum_g: Long, sum_b: Long,
                            sum_top: Long, sum_left: Long)

  /** REAL compressed-image codec through the same partition-wise seam
    * — PNG per the published spec (RFC 2083 / ISO 15948), the first
    * format in the family with genuine entropy coding: 8-bit
    * truecolor, non-interlaced. The decoder does everything a real
    * one must: verifies the 8-byte signature, walks BIG-endian length
    * + type + body + CRC chunks (BMP/WAV pinned little-endian; this
    * pins the opposite), CHECKS the CRC32 of every chunk, skips
    * ancillary chunks (a tEXt sits in the stream), CONCATENATES all
    * IDAT bodies before inflating (the encoder splits IDAT in two —
    * per-chunk inflate is the classic broken shortcut), inflates the
    * real zlib stream (`java.util.zip.Inflater`), and unfilters every
    * scanline through all five spec filters (None/Sub/Up/Average/
    * Paeth — the encoder cycles them row by row, so each is on the
    * hash gate, not just in a unit test). */
  private[graft] def pngStats(docId: Long, d: Array[Byte]): PngStats = {
    val (w, h, px) = pngPixels(docId, d)
    val (sr, sg, sb, sTop, sLeft) = pixelSums(w, h, px)
    PngStats(docId, w, h, sr, sg, sb, sTop, sLeft)
  }

  /** Decode an 8-bit truecolor non-interlaced PNG to a top-down
    * row-major RGB pixel array: signature check, big-endian chunk
    * walk with per-chunk CRC32 verification, ancillary-chunk skip,
    * IDAT concatenation, zlib inflate, and all five spec scanline
    * unfilters. */
  private[graft] def pngPixels(docId: Long,
                               d: Array[Byte]): (Int, Int, Array[Int]) = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    require(d.length >= 8 && d.take(8).sameElements(sig),
      s"doc $docId: not a PNG")
    def be32(o: Int): Int = ((d(o) & 0xff) << 24) | ((d(o + 1) & 0xff) << 16) |
      ((d(o + 2) & 0xff) << 8) | (d(o + 3) & 0xff)
    def str4(o: Int) = new String(d, o, 4, "US-ASCII")
    var off = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(off + 12 <= d.length, s"doc $docId: truncated chunk list")
      val len = be32(off); val typ = str4(off + 4); val body = off + 8
      // the declared body + CRC must fit before anything reads them
      require(len >= 0 && body.toLong + len + 4 <= d.length,
        s"doc $docId: truncated $typ chunk (len=$len)")
      val crc = new java.util.zip.CRC32()
      crc.update(d, off + 4, 4 + len)
      require(crc.getValue.toInt == be32(body + len),
        s"doc $docId: CRC mismatch on $typ")
      typ match {
        case "IHDR" =>
          w = be32(body); h = be32(body + 4)
          require(d(body + 8) == 8 && d(body + 9) == 2 &&
            d(body + 10) == 0 && d(body + 11) == 0 && d(body + 12) == 0,
            s"doc $docId: only 8-bit truecolor non-interlaced supported")
        case "IDAT" => idat.write(d, body, len)
        case "IEND" => done = true
        case _ => () // ancillary (tEXt/...): skip
      }
      off = body + len + 4
    }
    require(w > 0 && h > 0, s"doc $docId: no IHDR")
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val stride = 1 + 3 * w
    val raw = new Array[Byte](stride * h)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      require(n > 0 || inf.finished(), s"doc $docId: bad zlib stream")
      got += n
    }
    inf.end()
    require(got == raw.length, s"doc $docId: short pixel stream ($got)")
    // unfilter in place: prev row already reconstructed
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val px = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      val f = raw(y * stride) & 0xff
      var i = 0
      while (i < 3 * w) {
        val cur = raw(y * stride + 1 + i) & 0xff
        val left = if (i >= 3) px((y * w * 3) + i - 3) else 0
        val up = if (y > 0) px(((y - 1) * w * 3) + i) else 0
        val ul = if (y > 0 && i >= 3) px(((y - 1) * w * 3) + i - 3) else 0
        val v = f match {
          case 0 => cur
          case 1 => (cur + left) & 0xff
          case 2 => (cur + up) & 0xff
          case 3 => (cur + (left + up) / 2) & 0xff
          case 4 => (cur + paeth(left, up, ul)) & 0xff
          case _ => throw new IllegalArgumentException(
            s"doc $docId: bad filter $f")
        }
        px(y * w * 3 + i) = v
        i += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** Closed-form PNG: dims from the doc id, RGB channels linear in
    * (doc_id, x, y) — the oracle recomputes them codec-free. Each
    * scanline carries filter (docId + y) % 5, so the five spec
    * filters all sit on the gate; the filtered stream deflates
    * through the real `java.util.zip.Deflater`, IDAT splits into two
    * chunks, and a tEXt ancillary chunk sits between them. */
  private[graft] def encodePng(docId: Long): Array[Byte] = {
    val w = 4 + (docId % 5).toInt
    val h = 3 + (docId % 4).toInt
    val px = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        px(o) = ((docId * 29 + x * 7 + y * 13) % 256).toInt
        px(o + 1) = ((docId * 19 + x * 11 + y * 3) % 256).toInt
        px(o + 2) = ((docId * 13 + x * 5 + y * 17) % 256).toInt
        x += 1
      }
      y += 1
    }
    pngFromPixels(w, h, px, docId, s"Comment\u0000graft $docId")
  }

  /** Encode a top-down row-major RGB surface as a real 8-bit
    * truecolor PNG: per-row filter `(filterSeed + y) % 5` (all five
    * spec filters on the stream), real zlib DEFLATE, the IDAT split
    * in two with an ancillary tEXt chunk between them. */
  private[graft] def pngFromPixels(w: Int, h: Int, px: Array[Int],
                                   filterSeed: Long,
                                   comment: String): Array[Byte] = {
    val stride = 1 + 3 * w
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val f = ((filterSeed + y) % 5).toInt
      raw(y * stride) = f.toByte
      var i = 0
      while (i < 3 * w) {
        val cur = px(y * w * 3 + i)
        val left = if (i >= 3) px(y * w * 3 + i - 3) else 0
        val up = if (y > 0) px((y - 1) * w * 3 + i) else 0
        val ul = if (y > 0 && i >= 3) px((y - 1) * w * 3 + i - 3) else 0
        val enc = f match {
          case 0 => cur
          case 1 => (cur - left) & 0xff
          case 2 => (cur - up) & 0xff
          case 3 => (cur - (left + up) / 2) & 0xff
          case 4 => (cur - paeth(left, up, ul)) & 0xff
        }
        raw(y * stride + 1 + i) = enc.toByte
        i += 1
      }
      y += 1
    }
    // loop until finished(): zlib's worst case EXCEEDS input+64 on
    // incompressible surfaces (~5 bytes per 16 KiB block), and a
    // single deflate() call would silently truncate the stream into
    // a corrupt PNG (code-review r10)
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val zchunk = new Array[Byte](8192)
    while (!defl.finished()) {
      val n = defl.deflate(zchunk)
      zout.write(zchunk, 0, n)
    }
    defl.end()
    val zbuf = zout.toByteArray
    val zlen = zbuf.length
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Array[Byte] = Array((v >>> 24).toByte,
      (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, body: Array[Byte]): Unit = {
      out.write(be32(body.length))
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      out.write(tb); out.write(body); out.write(be32(crc.getValue.toInt))
    }
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0))
    // tEXt BEFORE the IDAT run: ISO 15948 requires multiple IDATs to
    // be CONSECUTIVE, so an ancillary chunk between them made the
    // emitted files spec-invalid for strict decoders even though the
    // in-repo decoder tolerated it (code-review r10). The decoder
    // still must skip the ancillary chunk AND concatenate split
    // IDATs - both properties stay on the gate.
    chunk("tEXt", comment.getBytes("US-ASCII"))
    val cut = zlen / 2 // split IDAT: decoders must concatenate bodies
    chunk("IDAT", zbuf.slice(0, cut))
    chunk("IDAT", zbuf.slice(cut, zlen))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Media table of REAL compressed images: one closed-form PNG per
    * document id, built executor-side like [[bmpTable]]. */
  def pngTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val b = encodePng(id)
        MediaRow(id, b, "image", b.length)
      })
      .toDF()
  }

  /** Media table of REAL encoded images: one closed-form BMP per
    * document id. Encoding runs as a typed map (the codec seam's
    * write direction) — distributed, payload built executor-side. */
  def bmpTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val b = encodeBmp(id)
        MediaRow(id, b, "image", b.length)
      })
      .toDF()
  }

  /** Stand-in media table: the documents' UTF-8 bytes as payload
    * (source→binary ingestion plumbing; a real pipeline reads
    * `binaryFile` sources or parquet with binary columns). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"))
      .withColumn("n_bytes", length(col("media")))

  /** Media table with REAL payloads on every branch: image docs carry
    * a spec-conformant BMP, audio docs a RIFF/WAVE PCM clip, video
    * docs a RIFF/AVI container (all closed-form in doc_id, so oracles
    * recompute their contents codec-free). Same (doc_id → kind)
    * routing as [[mediaTable]]; payloads built executor-side as a
    * typed map. */
  def realMediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val b = (id % 3) match {
          case 0 => encodeBmp(id)
          case 1 => encodeWav(id)
          case _ => encodeAvi(id)
        }
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, b, kind, b.length)
      }).toDF()
  }

  /** Partition-wise decode: one codec instance per partition, rows
    * streamed through it (the mapInPandas batch shape). */
  def decodeAll(media: DataFrame, codec: MediaCodec = DispatchCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition init seam (real codecs allocate here)
      it.map(codec.decode)
    }
  }

  /** Resize stage: cap the longer side at `maxDim`, preserving aspect
    * ratio (integer truncation, floorMod-free: dims are positive).
    * Payload-free typed map over the decoded records — the stage a
    * real pipeline runs between decode and feature extraction;
    * features pass through unchanged (a pixel codec would
    * re-extract). */
  def resizeAll(decoded: Dataset[MediaFeatures], maxDim: Int): Dataset[MediaFeatures] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { f =>
      val longer = math.max(f.width, f.height)
      if (longer <= maxDim) f
      else {
        val scale = maxDim.toDouble / longer
        f.copy(width = math.max(1, (f.width * scale).toInt),
          height = math.max(1, (f.height * scale).toInt))
      }
    }
  }

  /** Frame-sampling stage: one row per sampled frame of each video —
    * the explode that feeds per-frame models downstream. Offsets come
    * from the decode stage: the REAL absolute payload position of
    * each `00dc` chunk, as demuxed (and idx1-verified) by
    * [[AviCodec]]. */
  def frameRows(decoded: DataFrame): DataFrame =
    decoded.filter(col("kind") === "video")
      .select(col("doc_id"),
        posexplode(col("frame_offsets")).as(Seq("frame_no", "offset")))

  /** Metadata projection — payload-pruned scan (check ReadSchema:
    * `media` is still read here because n_bytes/hash derive from it;
    * a metadata-only query prunes it entirely). */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
      col("doc_id"), col("kind"), col("n_bytes"),
      md5(col("media")).as("content_hash"))

  // --- perceptual-hash near-duplicate detection over the codec seam ---

  /** One RGB channel of the phash corpus. The image id is pre-mixed
    * through an LCG mod a prime so step-k id subsets stay
    * discriminative (raw `img*c % 200` makes ids congruent mod 200
    * pixel-identical), and channels are bounded to [0, 200) so the
    * variant's small additive perturbation never wraps a byte. */
  private def phashMix(img: Long): Long =
    ((img % 1000003L) * 1103515245L + 12345L) % 2147483647L

  private[graft] def phashPixels(img: Long,
                                 perturbed: Boolean): Array[Int] = {
    val i1 = phashMix(img)
    val px = new Array[Int](PhashDim * PhashDim * 3)
    var y = 0
    while (y < PhashDim) {
      var x = 0
      while (x < PhashDim) {
        val p = if (perturbed && (x + 2 * y) % 13 == 0)
          1 + (img % 3).toInt else 0
        val o = (y * PhashDim + x) * 3
        px(o) = ((i1 * 179 + x * 89 + y * 101 + x * y * 53) % 200).toInt + p
        px(o + 1) = ((i1 * 283 + x * 97 + y * 61 + x * y * 31) % 200).toInt + p
        px(o + 2) = ((i1 * 419 + x * 67 + y * 73 + x * y * 59) % 200).toInt + p
        x += 1
      }
      y += 1
    }
    px
  }

  private[graft] val PhashDim = 16

  /** 64-bit integer average-hash (aHash) of a decoded 16x16 RGB
    * surface: integer grayscale (r+g+b)/3, 2x2 block sums, bit b set
    * iff its block sum clears the image mean (64*S_b >= total).
    * Returned as two nonnegative 32-bit halves so the DuckDB oracle
    * restates it without signed-shift knife edges. */
  private[graft] def averageHash64(w: Int, h: Int,
                                   px: Array[Int]): (Long, Long) = {
    require(w == PhashDim && h == PhashDim,
      s"averageHash64 expects ${PhashDim}x$PhashDim, got ${w}x$h")
    val s = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        val gray = (px(o) + px(o + 1) + px(o + 2)) / 3
        s((y / 2) * 8 + (x / 2)) += gray
        x += 1
      }
      y += 1
    }
    var t = 0L
    var b = 0
    while (b < 64) { t += s(b); b += 1 }
    var hi = 0L; var lo = 0L
    b = 0
    while (b < 64) {
      if (64L * s(b) >= t) {
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
      b += 1
    }
    (hi, lo)
  }

  /** Phash corpus: for every 10th document, its image encoded twice
    * through DIFFERENT real codecs — the base surface as a BMP
    * (row id 3*doc_id) and a lightly perturbed variant as a PNG
    * (row id 3*doc_id+1; every 5th image adds a third cross-codec
    * twin at 3*doc_id+2). Near-dup pairs therefore cross the codec
    * boundary: matching them proves both decoders reconstruct the
    * same pixel surface. */
  def phashTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
      .filter(_ % 10 == 0)
      .mapPartitions(_.flatMap { id =>
        val bmp = bmpFromPixels(PhashDim, PhashDim, phashPixels(id, perturbed = false))
        val png = pngFromPixels(PhashDim, PhashDim, phashPixels(id, perturbed = true),
          filterSeed = id, comment = s"Comment\u0000graft phash $id")
        val base = Iterator(MediaRow(id * 3, bmp, "image", bmp.length),
          MediaRow(id * 3 + 1, png, "image", png.length))
        // every 5th image also carries its PERTURBED surface as a
        // BMP — a Hamming-0 cross-codec twin of the PNG row — so
        // neighbor groups have unequal sizes (pairs AND trios) and
        // the count aggregation is exercised beyond symmetric pairs
        if (id % 50 == 0) {
          val twin =
            bmpFromPixels(PhashDim, PhashDim, phashPixels(id, perturbed = true))
          base ++ Iterator(MediaRow(id * 3 + 2, twin, "image", twin.length))
        } else base
      })
      .toDF()
  }

  /** Perceptual near-dup: decode every image through its real codec
    * (dispatch on magic bytes), average-hash the pixel surface, and
    * find all pairs within Hamming radius 3 via the SimHash
    * pigeonhole — 4 exact 16-bit bands over the 64-bit hash, band
    * join, then popcount verify on candidates only. Emits every
    * row's hash plus its within-radius neighbor count, so the gate
    * pins ALL hashes (both codecs' pixel output) and the banded
    * discovery result in one relation.
    *
    * At 100 TB: discovery never goes all-pairs — candidates are
    * bounded by band-bucket collisions (16-bit keys; a production
    * corpus adds the hot-bucket cap exactly as `d_simhash_prod`
    * does), and the verify is a popcount on two longs. */
  def phashNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = phashTable(s, dir).as[MediaRow]
      .mapPartitions(_.map { r =>
        val (w, h, px) =
          if (r.media(0) == 'B'.toByte) bmpPixels(r.doc_id, r.media)
          else pngPixels(r.doc_id, r.media)
        val (hi, lo) = averageHash64(w, h, px)
        (r.doc_id, hi, lo)
      }).toDF("doc_id", "hash_hi", "hash_lo")
    val banded = hashes.select(col("doc_id"), col("hash_hi"), col("hash_lo"),
      explode(array(
        struct(lit(0).as("band"), col("hash_lo").bitwiseAND(lit(0xFFFFL)).as("key")),
        struct(lit(1).as("band"), shiftright(col("hash_lo"), 16).as("key")),
        struct(lit(2).as("band"), col("hash_hi").bitwiseAND(lit(0xFFFFL)).as("key")),
        struct(lit(3).as("band"), shiftright(col("hash_hi"), 16).as("key")))).as("bk"))
      .select(col("doc_id"), col("hash_hi"), col("hash_lo"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.select(col("doc_id").as("ida"), col("hash_hi").as("hia"),
      col("hash_lo").as("loa"), col("band"), col("key"))
    val b = banded.select(col("doc_id").as("idb"), col("hash_hi").as("hib"),
      col("hash_lo").as("lob"), col("band"), col("key"))
    val pairs = a.join(b, Seq("band", "key"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb", "hia", "loa", "hib", "lob").distinct()
      .filter(bit_count(col("hia").bitwiseXOR(col("hib"))) +
        bit_count(col("loa").bitwiseXOR(col("lob"))) <= 3)
    val nbr = pairs.select(col("ida").as("doc_id"))
      .union(pairs.select(col("idb").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_neighbors"))
    hashes.join(nbr, Seq("doc_id"), "left")
      .select(col("doc_id"), col("hash_hi"), col("hash_lo"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mediaMeta _),
    // decode DISPATCH over real payloads: image rows decode a real
    // BMP (width/height out of the BITMAPINFOHEADER), audio rows a
    // real RIFF/WAVE (rate/sample-count out of the fmt/data chunks),
    // video rows a real RIFF/AVI (dims out of avih, frame count out
    // of the cross-validated movi/idx1 demux). The oracle derives
    // each kind's dims from the container formulas with no codec,
    // and n_features pins WHICH codec ran per kind — a wrong
    // dispatch or a header misparse flips the hash.
    "mm_decode" -> ((s, dir) => {
      val d = decodeAll(realMediaTable(s, dir), DispatchCodec).toDF()
      d.select(col("doc_id"), col("kind"), col("width"), col("height"),
        size(col("features")).as("n_features"),
        size(col("frame_offsets")).as("n_frames"))
    }),
    // frame offsets are the REAL absolute payload positions of each
    // 00dc chunk out of the AVI demux; the oracle restates the whole
    // container-layout arithmetic (header sizes, JUNK padding,
    // per-frame even-padding cumsum) in SQL — a one-byte walk error
    // shifts every offset
    "mm_frames" -> ((s, dir) =>
      frameRows(decodeAll(realMediaTable(s, dir), DispatchCodec).toDF())),
    // the REAL-codec gate: encode a closed-form 24bpp BMP per doc,
    // decode it back through the partition-wise seam, emit exact
    // integer pixel sums. The oracle recomputes the sums from the
    // pixel formula with NO codec — hash equality proves the decoder
    // read genuine pixel data out of a spec-conformant container
    // (stride padding, bottom-up row order, and BGR channel order
    // each corrupt a region/channel sum if mishandled)
    "mm_image" -> ((s, dir) => {
      import s.implicits._
      bmpTable(s, dir).as[MediaRow]
        .mapPartitions(_.map(r => bmpStats(r.doc_id, r.media)))
        .toDF()
    }),
    // the REAL-audio-codec gate, same contract as mm_image: encode a
    // closed-form RIFF/WAVE PCM clip per doc (odd-sized JUNK chunk in
    // the chunk list), decode it back through the partition-wise
    // seam, emit exact integer sample sums; the oracle recomputes
    // them from the sample formula with NO codec. Chunk walking,
    // even-padding, little-endian signed-16 decode, and sample order
    // each corrupt a sum if mishandled.
    "mm_audio" -> ((s, dir) => {
      import s.implicits._
      wavTable(s, dir).as[MediaRow]
        .mapPartitions(_.map(r => wavStats(r.doc_id, r.media)))
        .toDF()
    }),
    // the COMPRESSED-image gate: a real PNG (zlib DEFLATE + the five
    // spec scanline filters, cycled per row) per doc; the decoder
    // checks every chunk CRC, concatenates split IDATs, inflates,
    // unfilters. The oracle recomputes pixel sums from the formula
    // with NO codec — hash equality proves real decompression
    // recovered every pixel.
    "mm_png" -> ((s, dir) => {
      import s.implicits._
      pngTable(s, dir).as[MediaRow]
        .mapPartitions(_.map(r => pngStats(r.doc_id, r.media)))
        .toDF()
    }),
    // the REAL-video-container gate, same contract as mm_image/
    // mm_audio: encode a closed-form RIFF/AVI per doc (odd JUNK chunk
    // before movi, odd frame sizes inside it), demux it back through
    // the partition-wise seam, emit exact integer layout + payload
    // sums; the oracle recomputes them from the size/byte formulas
    // with NO codec. Chunk walking, nested LISTs, even-padding, and
    // the idx1 cross-check each corrupt a sum if mishandled.
    "mm_video" -> ((s, dir) => {
      import s.implicits._
      aviTable(s, dir).as[MediaRow]
        .mapPartitions(_.map(r => aviStats(r.doc_id, r.media)))
        .toDF()
    }),
    // perceptual-hash near-dup ACROSS codecs: base image as a real
    // BMP, perturbed variant as a real PNG; decode both, aHash the
    // pixels, banded Hamming-radius-3 discovery. The oracle
    // recomputes every hash from the pixel FORMULA (no codec, no
    // banding) and counts neighbors all-pairs — hash equality proves
    // (a) both decoders recovered the exact surface, (b) the
    // pigeonhole discovery found exactly the true within-radius set.
    "mm_phash" -> (phashNearDup _))

  val oracle: Map[String, String] = Map(
    "mm_meta" ->
      "SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes, md5(text) AS content_hash FROM documents",
    // absolute payload offset of frame k: movi_start(= 220 + padded
    // JUNK) + 12 (LIST hdr + 'movi' fourcc) + Σ_{i<k}(8 + padded
    // size_i) + 8 (the frame's own chunk header) — the exact layout
    // arithmetic encodeAvi writes and aviParse must walk
    "mm_frames" ->
      """WITH v AS (SELECT doc_id, 4 + doc_id % 6 AS n, 5 + doc_id % 4 AS j
        |    FROM documents WHERE doc_id % 3 = 2),
        |  f AS (SELECT doc_id, 220 + j + j % 2 AS movi_start,
        |    unnest(range(0, n)) AS k FROM v),
        |  sz AS (SELECT doc_id, movi_start, k,
        |    24 + (doc_id*7 + k*13) % 17 AS sz FROM f)
        |SELECT doc_id, CAST(k AS INTEGER) AS frame_no,
        |  CAST(movi_start + 20 + coalesce(sum(8 + sz + sz % 2)
        |    OVER (PARTITION BY doc_id ORDER BY k
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS INTEGER) AS offset
        |FROM sz""".stripMargin,
    // the VIDEO branch of mm_decode rides the stub: DETERMINISTIC
    // arithmetic over the payload bytes (rolling h=h*31+b hash mod
    // 2^64) that oracles in SQL — HUGEINT arithmetic restates the
    // unsigned 64-bit hash, floorMod(h>>8,64) ≡ (hu//256)%64 on the
    // unsigned value (mod-64 reads bits 8..13 regardless of shift
    // signedness), bytes ≡ codepoints because the corpus is ASCII
    // (verified). Hash equality proves the mapPartitions decode seam
    // delivers exact per-row outputs independent of partitioning.
    // pixel channels are linear in (doc_id, x, y): the oracle crosses
    // each doc with its w×h pixel grid and sums the same formulas the
    // encoder wrote — pure integer arithmetic on both sides
    "mm_image" ->
      """WITH dims AS (SELECT doc_id, 5 + doc_id % 4 AS w, 3 + doc_id % 3 AS h FROM documents),
        |  xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM dims),
        |  px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
        |  ch AS (SELECT doc_id, w, h, x, y,
        |    (doc_id*31 + x*7 + y*13) % 256 AS r,
        |    (doc_id*17 + x*11 + y*5) % 256 AS g,
        |    (doc_id*23 + x*3 + y*19) % 256 AS b FROM px)
        |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(sum(CASE WHEN y < h // 2 THEN r + g + b ELSE 0 END) AS BIGINT) AS sum_top,
        |  CAST(sum(CASE WHEN x < w // 2 THEN r + g + b ELSE 0 END) AS BIGINT) AS sum_left
        |FROM ch GROUP BY doc_id, w, h""".stripMargin,
    // samples are linear in (doc_id, i) with a signed offset; both
    // sides use nonnegative-mod-then-shift so Scala % and DuckDB %
    // agree, and all sums are exact integers
    "mm_audio" ->
      """WITH nn AS (SELECT doc_id, 50 + doc_id % 32 AS n,
        |    8000 + (doc_id % 4) * 4000 AS rate FROM documents),
        |  s AS (SELECT doc_id, n, rate, unnest(range(0, n)) AS i FROM nn),
        |  v AS (SELECT doc_id, n, rate, i,
        |    (doc_id*37 + i*11) % 4096 - 2048 AS smp FROM s)
        |SELECT doc_id, CAST(rate AS INTEGER) AS sample_rate,
        |  CAST(n AS INTEGER) AS n_samples,
        |  CAST(sum(smp) AS BIGINT) AS sum_s,
        |  CAST(sum(abs(smp)) AS BIGINT) AS sum_abs,
        |  CAST(sum(smp*smp) AS BIGINT) AS sum_sq,
        |  CAST(sum(CASE WHEN i < n // 2 THEN smp ELSE 0 END) AS BIGINT) AS sum_first_half,
        |  CAST(max(smp) AS INTEGER) AS max_s
        |FROM v GROUP BY doc_id, rate, n""".stripMargin,
    "mm_png" ->
      """WITH dims AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
        |  xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM dims),
        |  px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
        |  ch AS (SELECT doc_id, w, h, x, y,
        |    (doc_id*29 + x*7 + y*13) % 256 AS r,
        |    (doc_id*19 + x*11 + y*3) % 256 AS g,
        |    (doc_id*13 + x*5 + y*17) % 256 AS b FROM px)
        |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(sum(CASE WHEN y < h // 2 THEN r + g + b ELSE 0 END) AS BIGINT) AS sum_top,
        |  CAST(sum(CASE WHEN x < w // 2 THEN r + g + b ELSE 0 END) AS BIGINT) AS sum_left
        |FROM ch GROUP BY doc_id, w, h""".stripMargin,
    // three codec-free branches, one per dispatch target: image dims
    // from the BMP formula, audio (rate, samples) from the WAV
    // formula, video (dims, frame count) from the AVI formulas; the
    // per-kind n_features constant pins which decoder ran
    "mm_decode" ->
      """SELECT doc_id, 'image' AS kind, CAST(5 + doc_id % 4 AS INTEGER) AS width, CAST(3 + doc_id % 3 AS INTEGER) AS height, CAST(6 AS INTEGER) AS n_features, CAST(0 AS INTEGER) AS n_frames FROM documents WHERE doc_id % 3 = 0
        |UNION ALL SELECT doc_id, 'audio', CAST(8000 + (doc_id % 4) * 4000 AS INTEGER), CAST(50 + doc_id % 32 AS INTEGER), CAST(5 AS INTEGER), CAST(0 AS INTEGER) FROM documents WHERE doc_id % 3 = 1
        |UNION ALL SELECT doc_id, 'video', CAST(16 + (doc_id % 8) * 4 AS INTEGER), CAST(12 + (doc_id % 5) * 4 AS INTEGER), CAST(7 AS INTEGER), CAST(4 + doc_id % 6 AS INTEGER) FROM documents WHERE doc_id % 3 = 2""".stripMargin,
    // whole-demux restatement: sizes, layout offsets (cumsum of
    // even-padded strides), and payload byte sums all recomputed
    // from the closed forms with no codec
    "mm_video" ->
      """WITH v AS (SELECT doc_id, 4 + doc_id % 6 AS n,
        |    16 + (doc_id % 8) * 4 AS w, 12 + (doc_id % 5) * 4 AS h,
        |    24 + (doc_id % 3) * 6 AS rate
        |    FROM documents WHERE doc_id % 7 = 0),
        |  f AS (SELECT doc_id, n, w, h, rate, unnest(range(0, n)) AS k FROM v),
        |  sz AS (SELECT doc_id, n, w, h, rate, k,
        |    24 + (doc_id*7 + k*13) % 17 AS sz FROM f),
        |  rel AS (SELECT doc_id, n, w, h, rate, k, sz,
        |    4 + coalesce(sum(8 + sz + sz % 2) OVER (PARTITION BY doc_id
        |      ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS rel_off FROM sz),
        |  b AS (SELECT doc_id, k, sz, unnest(range(0, sz)) AS t FROM sz),
        |  bs AS (SELECT doc_id, sum((doc_id*11 + k*17 + t*5) % 251) AS sb
        |    FROM b GROUP BY doc_id)
        |SELECT r.doc_id, CAST(max(w) AS INTEGER) AS width,
        |  CAST(max(h) AS INTEGER) AS height,
        |  CAST(max(n) AS INTEGER) AS n_frames,
        |  CAST(max(rate) AS INTEGER) AS rate,
        |  CAST(sum(sz) AS BIGINT) AS sum_sizes,
        |  CAST(sum(rel_off) AS BIGINT) AS sum_rel_offsets,
        |  CAST(max(sb) AS BIGINT) AS sum_bytes,
        |  CAST(min(CASE WHEN k = 0 THEN rel_off END) AS INTEGER) AS first_off,
        |  CAST(max(CASE WHEN k = n - 1 THEN rel_off END) AS INTEGER) AS last_off
        |FROM rel r JOIN bs ON r.doc_id = bs.doc_id
        |GROUP BY r.doc_id""".stripMargin,
    // hashes recomputed from the pixel formula codec-free; neighbor
    // counts by EXACT all-pairs popcount (no banding in the oracle)
    "mm_phash" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0),
        |v AS (SELECT doc_id*3 AS rid, doc_id AS img, 0 AS pert FROM ids
        |      UNION ALL SELECT doc_id*3+1, doc_id, 1 FROM ids
        |      UNION ALL SELECT doc_id*3+2, doc_id, 1 FROM ids WHERE doc_id % 50 = 0),
        |g AS (SELECT rid, img, pert, x, y
        |      FROM v, (SELECT unnest(range(0,16)) AS x), (SELECT unnest(range(0,16)) AS y)),
        |vm AS (SELECT rid, ((img % 1000003) * 1103515245 + 12345) % 2147483647 AS i1,
        |       pert, x, y, img FROM g),
        |gr AS (SELECT rid, x//2 AS bx, y//2 AS by,
        |   (((i1*179 + x*89 + y*101 + x*y*53)%200 + (i1*283 + x*97 + y*61 + x*y*31)%200
        |     + (i1*419 + x*67 + y*73 + x*y*59)%200
        |     + CASE WHEN pert=1 AND (x+2*y)%13=0 THEN 3*(1+img%3) ELSE 0 END) // 3) AS gray
        | FROM vm),
        |blk AS (SELECT rid, by*8+bx AS b, sum(gray) AS s FROM gr GROUP BY rid, bx, by),
        |tot AS (SELECT rid, sum(s) AS t FROM blk GROUP BY rid),
        |bits AS (SELECT blk.rid, b, CASE WHEN 64*s >= t THEN 1 ELSE 0 END AS bit
        |  FROM blk JOIN tot USING (rid)),
        |h AS (SELECT rid,
        |   CAST(sum(CASE WHEN b < 32 THEN bit * (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS hash_lo,
        |   CAST(sum(CASE WHEN b >= 32 THEN bit * (CAST(1 AS BIGINT) << CAST(b-32 AS INTEGER)) ELSE 0 END) AS BIGINT) AS hash_hi
        | FROM bits GROUP BY rid),
        |nb AS (SELECT a.rid, count(*) AS n FROM h a JOIN h b ON a.rid <> b.rid
        |   AND bit_count(xor(a.hash_lo, b.hash_lo)) + bit_count(xor(a.hash_hi, b.hash_hi)) <= 3
        | GROUP BY a.rid)
        |SELECT h.rid AS doc_id, hash_hi, hash_lo, CAST(coalesce(n, 0) AS BIGINT) AS n_neighbors
        |FROM h LEFT JOIN nb ON h.rid = nb.rid""".stripMargin)
}

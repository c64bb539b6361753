package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 scale ops): media treated
  * as opaque `binary` payloads processed in partition-sized batches.
  *
  * The decode path is REAL end-to-end on a pure-JVM format: payloads
  * are P6 PPM images (binary RGB, the classic codec-free format — an
  * ASCII header followed by a raw pixel array), the decoder is a real
  * header parser (magic, whitespace/comment handling, dims, maxval)
  * plus pixel-array extraction, and the resize is a real
  * nearest-neighbor resample over decoded pixels. Only the payload
  * SYNTHESIS is a stand-in: the testdata carries no media files, so
  * each document's image is generated deterministically from its
  * doc_id — with pixel bytes chosen so a DuckDB oracle can
  * re-enumerate the exact array and check the decoded sums
  * bit-for-bit (m01/m02/m03 are all oracle-exact, not rows-only).
  *
  * Scale shape: `mapPartitions` batches (one iterator per partition,
  * so a production decoder/codec would init once per partition, the
  * Scala analog of mapInPandas batch processing); payload bytes never
  * shuffle — every query reduces to per-doc rows before its sort.
  */
object Multimodal {

  /** Deterministic P6 payload for a doc: header `P6\n<w> <h>\n255\n`
    * then w*h*3 pixel bytes with byte i = (doc_id*31 + 7*i) mod 256 —
    * a real, parseable image whose pixel array an SQL oracle can
    * regenerate with generate_series. */
  private[graft] def ppmPayload(docId: Long): Array[Byte] = {
    val w = (docId % 64 + 16).toInt
    val h = (docId % 48 + 16).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    val n = w * h * 3
    var i = 0
    while (i < n) {
      out(header.length + i) = ((docId * 31 + 7L * i) % 256).toByte
      i += 1
    }
    out
  }

  /** A decoded image: dims + the raw interleaved-RGB pixel array. */
  private[graft] case class Ppm(width: Int, height: Int, pixels: Array[Byte])

  /** REAL P6 parser — not a stub: validates the magic, consumes
    * whitespace and `#` comments between header tokens (the format
    * allows them), reads ASCII dims and maxval, then takes the binary
    * pixel array that follows the single whitespace after maxval.
    * Malformed input raises instead of decoding garbage. */
  private[graft] def decodePpm(bytes: Array[Byte]): Ppm = {
    var pos = 0
    def skipWs(): Unit = {
      var go = true
      while (go && pos < bytes.length) bytes(pos) match {
        case ' ' | '\n' | '\r' | '\t' => pos += 1
        case '#' => while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        case _ => go = false
      }
    }
    def int(): Int = {
      skipWs()
      require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
        s"PPM: expected integer at byte $pos")
      var v = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      v
    }
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "PPM: bad magic")
    pos = 2
    val w = int(); val h = int(); val maxv = int()
    require(maxv == 255, s"PPM: unsupported maxval $maxv")
    require(pos < bytes.length, "PPM: missing pixel array")
    pos += 1 // exactly one whitespace byte separates maxval from pixels
    require(bytes.length - pos == w * h * 3,
      s"PPM: pixel array is ${bytes.length - pos} bytes, expected ${w * h * 3}")
    Ppm(w, h, java.util.Arrays.copyOfRange(bytes, pos, bytes.length))
  }

  /** Nearest-neighbor resample (real pixels, integer index mapping
    * sx = x*w/ow, sy = y*h/oh) — returns the resized pixel array. */
  private[graft] def resampleNn(img: Ppm, ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = y * img.height / oh
      var x = 0
      while (x < ow) {
        val sx = x * img.width / ow
        val src = (sy * img.width + sx) * 3
        val dst = (y * ow + x) * 3
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** The synthesized media frame: doc_id + PPM payload bytes — the
    * ingest step a production pipeline replaces with binaryFile reads. */
  private def mediaFrames(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, ppmPayload(id))))
  }

  /** m01: binary payloads → per-partition batch decode (REAL P6 parse)
    * → typed feature rows: dims from the parsed header, payload size,
    * and per-channel pixel sums. Every output column is recomputed
    * exactly by the DuckDB oracle. */
  def m01Multimodal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaFrames(s, d).mapPartitions { it =>
      // partition = batch: decoder state would init once here
      it.map { case (id, bytes) =>
        val img = decodePpm(bytes)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.pixels.length) {
          val v = img.pixels(i) & 0xff
          (i % 3: @annotation.switch) match {
            case 0 => sr += v
            case 1 => sg += v
            case _ => sb += v
          }
          i += 1
        }
        (id, "ppm", img.width, img.height, bytes.length, sr, sg, sb)
      }
    }.toDF("doc_id", "format", "width", "height", "n_bytes", "sum_r", "sum_g", "sum_b")
      .orderBy("doc_id")
  }

  /** m02: decode → REAL nearest-neighbor resample into a 32×32 box
    * (aspect preserved) → re-encoded P6 size + resampled-pixel sum. */
  def m02Resize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (tw, th) = (32, 32)
    mediaFrames(s, d).mapPartitions { it =>
      it.map { case (id, bytes) =>
        val img = decodePpm(bytes)
        val scale = math.min(tw.toDouble / img.width, th.toDouble / img.height)
        val ow = math.max(1, (img.width * scale).toInt)
        val oh = math.max(1, (img.height * scale).toInt)
        val px = resampleNn(img, ow, oh)
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i) & 0xff; i += 1 }
        val outBytes = s"P6\n$ow $oh\n255\n".length + px.length // re-encoded size
        (id, img.width, img.height, ow, oh, outBytes, sum)
      }
    }.toDF("doc_id", "width", "height", "out_width", "out_height", "n_bytes_out", "sum_out")
      .orderBy("doc_id")
  }

  /** m03: frame sampling — every 4th 192-byte block (64 RGB pixels) of
    * the decoded pixel array treated as a frame, per-frame pixel sum
    * emitted (one row per sampled frame: the explode shape a video
    * pipeline produces). */
  def m03FrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val frameLen = 192
    val stride = 4
    mediaFrames(s, d).flatMap { case (id, bytes) =>
      val img = decodePpm(bytes)
      val nFrames = img.pixels.length / frameLen
      (0 until nFrames by stride).map { f =>
        var sum = 0L
        var i = f * frameLen
        while (i < (f + 1) * frameLen) { sum += img.pixels(i) & 0xff; i += 1 }
        (id, f, sum)
      }
    }.toDF("doc_id", "frame_idx", "frame_sum")
      .orderBy("doc_id", "frame_idx")
  }

  // ------------------------------------------------------------ audio
  /** Deterministic PCM WAV payload for a doc: a real 44-byte RIFF
    * header (PCM, mono, 8 kHz, 16-bit) followed by little-endian int16
    * samples with s(i) = ((doc_id·2654435761 + 1013904223·i) mod
    * 65536) − 32768 — a parseable audio file whose sample array an SQL
    * oracle regenerates with generate_series. */
  private[graft] def wavPayload(docId: Long): Array[Byte] = {
    val n = (docId % 2000 + 500).toInt
    val dataLen = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)            // PCM
      .putShort(1)            // mono
      .putInt(8000)           // sample rate
      .putInt(8000 * 2)       // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      out.putShort((((docId * 2654435761L + 1013904223L * i) % 65536) - 32768).toShort)
      i += 1
    }
    out.array()
  }

  /** Decoded PCM audio: rate + the int16 sample array. */
  private[graft] case class Wav(sampleRate: Int, samples: Array[Short])

  /** REAL RIFF/WAVE parser — validates the RIFF magic, walks the chunk
    * list (so a file with extra chunks before `data` still decodes),
    * checks PCM/mono/16-bit in `fmt `, and reads the little-endian
    * sample array from `data`. Malformed input raises. */
  private[graft] def decodeWav(bytes: Array[Byte]): Wav = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "WAV: bad RIFF magic")
    buf.getInt() // riff size
    require(tag() == "WAVE", "WAV: not a WAVE file")
    var rate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (rate < 0 || samples == null)) {
      val id = tag(); val len = buf.getInt()
      id match {
        case "fmt " =>
          val fmt = buf.getShort(); val ch = buf.getShort()
          rate = buf.getInt(); buf.getInt(); buf.getShort()
          val bits = buf.getShort()
          require(fmt == 1 && ch == 1 && bits == 16,
            s"WAV: unsupported encoding (fmt=$fmt ch=$ch bits=$bits)")
          buf.position(buf.position() + len - 16)
        case "data" =>
          require(rate > 0, "WAV: data chunk before fmt")
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort(); i += 1 }
        case _ => buf.position(buf.position() + len) // skip unknown chunk
      }
    }
    require(samples != null, "WAV: missing data chunk")
    Wav(rate, samples)
  }

  /** m04: audio payloads → per-partition batch decode (REAL RIFF/PCM
    * parse) → signal features: duration from the parsed rate, exact
    * integer sum / absolute sum, and zero-crossing count — every
    * column recomputed exactly by the DuckDB oracle. Same batch shape
    * as m01: payload bytes never shuffle; a production decoder inits
    * once per partition. */
  def m04Audio(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val wav = decodeWav(wavPayload(id))
        var sum = 0L; var sumAbs = 0L; var zc = 0
        var i = 0
        while (i < wav.samples.length) {
          val v = wav.samples(i).toLong
          sum += v; sumAbs += math.abs(v)
          if (i > 0 && v * wav.samples(i - 1) < 0) zc += 1
          i += 1
        }
        (id, wav.samples.length, wav.samples.length * 1000 / wav.sampleRate,
          sum, sumAbs, zc)
      })
      .toDF("doc_id", "n_samples", "duration_ms", "sum_samples", "sum_abs",
        "n_zero_cross")
      .orderBy("doc_id")
  }

  val m04OracleSql: String =
    """WITH p AS (SELECT doc_id, doc_id % 2000 + 500 AS n FROM documents),
      |samp AS (
      |  SELECT doc_id, i, ((doc_id * 2654435761 + 1013904223 * i) % 65536) - 32768 AS s
      |  FROM p, LATERAL unnest(generate_series(0, n - 1)) AS t(i)
      |),
      |lagd AS (
      |  SELECT doc_id, i, s, LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      |  FROM samp
      |)
      |SELECT doc_id,
      |       CAST(COUNT(*) AS INT) AS n_samples,
      |       CAST(COUNT(*) * 1000 // 8000 AS INT) AS duration_ms,
      |       CAST(SUM(s) AS BIGINT) AS sum_samples,
      |       CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
      |       CAST(SUM(CASE WHEN prev IS NOT NULL AND s * prev < 0 THEN 1 ELSE 0 END) AS INT)
      |         AS n_zero_cross
      |FROM lagd GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ m05
  /** Average-hash (aHash) bits for a decoded image: NN-resample to
    * 8×8, per-cell gray = r+g+b (the sum ranks identically to the
    * mean, no division rounding), bit = cell's gray strictly above the
    * image mean — compared as `gray·64 > total` so the arithmetic is
    * pure integers and bit-identical on any engine. Returned as a
    * 64-char '0'/'1' string (hex packing would be equivalent; the bit
    * string keeps the SQL oracle trivial). */
  /** The 64 per-cell gray sums (r+g+b) of the 8×8 NN-resample — the
    * integer visual descriptor under m05's aHash bits, and m08's
    * image-side embedding. */
  private[graft] def cellGrays(bytes: Array[Byte]): Array[Int] = {
    val img = decodePpm(bytes)
    val px = resampleNn(img, 8, 8)
    val cells = new Array[Int](64)
    var c = 0
    while (c < 64) {
      cells(c) = (px(c * 3) & 0xff) + (px(c * 3 + 1) & 0xff) + (px(c * 3 + 2) & 0xff)
      c += 1
    }
    cells
  }

  private[graft] def phashBits(bytes: Array[Byte]): String =
    phashBitsOfCells(cellGrays(bytes))

  /** The aHash bit string from an already-computed cell-gray vector —
    * split out so e11's single decode feeds both the descriptor and
    * the hash without decoding twice. */
  private[graft] def phashBitsOfCells(cells: Array[Int]): String = {
    var total = 0
    var c = 0
    while (c < 64) { total += cells(c); c += 1 }
    val bits = new java.lang.StringBuilder(64)
    var i = 0
    while (i < 64) { bits.append(if (cells(i) * 64 > total) '1' else '0'); i += 1 }
    bits.toString
  }

  /** m05: PERCEPTUAL-HASH IMAGE DEDUP (the image-side twin of d01):
    * every image reduces to its 64-bit aHash inside the scan-stage
    * batch decode — payload bytes never shuffle — then the d01 shape
    * groups on the hash (8-byte-equivalent key, map-side partials) to
    * find duplicate assets; each doc reports its group's representative
    * and size. The media seed is doc_id mod 97, so the synthetic
    * library contains genuinely repeated assets at every scale factor
    * (a real crawl's re-hosted images). At 100 TB the hash column is
    * stored at ingest and this is a pure key groupBy; near-dup (small
    * hamming distance) extends via d03's band blocking on the same
    * bits. */
  def m05ImageDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashed = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        (id, phashBits(ppmPayload(id % 97)))
      }).toDF("doc_id", "phash")
    val groups = hashed.groupBy("phash")
      .agg(count(lit(1)).as("n_group"), min("doc_id").as("rep_id"))
    hashed.join(groups, "phash")
      .select("doc_id", "phash", "rep_id", "n_group")
      .orderBy("doc_id")
  }

  val m05OracleSql: String =
    """WITH m AS (
      |  SELECT doc_id, doc_id % 97 AS sd,
      |         CAST((doc_id % 97) % 64 + 16 AS INT) AS w,
      |         CAST((doc_id % 97) % 48 + 16 AS INT) AS h
      |  FROM documents
      |), cells AS (
      |  SELECT doc_id, sd, j,
      |         ((((j // 8) * h // 8) * w + ((j % 8) * w // 8)) * 3) AS si
      |  FROM m, LATERAL unnest(generate_series(0, 63)) AS t(j)
      |), g AS (
      |  SELECT doc_id, j,
      |         (sd*31 + 7*si) % 256 + (sd*31 + 7*(si+1)) % 256
      |           + (sd*31 + 7*(si+2)) % 256 AS gray
      |  FROM cells
      |), b AS (
      |  SELECT doc_id, j,
      |         CASE WHEN gray * 64 > SUM(gray) OVER (PARTITION BY doc_id)
      |              THEN '1' ELSE '0' END AS bit
      |  FROM g
      |), p AS (
      |  SELECT doc_id, string_agg(bit, '' ORDER BY j) AS phash
      |  FROM b GROUP BY doc_id
      |), grp AS (
      |  SELECT phash, COUNT(*) AS n_group, MIN(doc_id) AS rep_id
      |  FROM p GROUP BY phash
      |)
      |SELECT p.doc_id, p.phash, grp.rep_id, grp.n_group
      |FROM p JOIN grp USING (phash)
      |ORDER BY p.doc_id""".stripMargin

  // ------------------------------------------------------------ m06
  /** Energy-envelope fingerprint for a decoded PCM clip — the audio
    * analog of m05's aHash (the Haitsma-Kalker/Philips fingerprint
    * family reduced to its integer core): split the clip into 64
    * equal windows (tail remainder truncated so window size is a pure
    * function of length), per-window energy = Σ|sample|, bit = window
    * energy strictly above the clip mean, compared as `e·64 > total`
    * so the arithmetic is pure integers and bit-identical on any
    * engine. 64-char '0'/'1' string like m05 (keeps the SQL oracle
    * trivial). */
  private[graft] def audioFpBits(bytes: Array[Byte]): String = {
    val wav = decodeWav(bytes)
    val w = wav.samples.length / 64
    val energies = new Array[Long](64)
    var total = 0L
    var k = 0
    while (k < 64) {
      var e = 0L
      var i = k * w
      val end = i + w
      while (i < end) { e += math.abs(wav.samples(i).toLong); i += 1 }
      energies(k) = e; total += e; k += 1
    }
    val bits = new java.lang.StringBuilder(64)
    var j = 0
    while (j < 64) { bits.append(if (energies(j) * 64 > total) '1' else '0'); j += 1 }
    bits.toString
  }

  /** m06: PERCEPTUAL AUDIO DEDUP (the audio-side twin of m05,
    * completing the multimodal dedup story image+audio): every clip
    * reduces to its 64-bit energy-envelope fingerprint inside the
    * scan-stage batch decode — payload bytes never shuffle — then the
    * d01 shape groups on the fingerprint to find re-hosted assets.
    * The media seed is doc_id mod 89 (co-prime with m05's 97, so
    * image and audio duplicate classes differ), giving genuinely
    * repeated clips at every scale factor. At 100 TB the fingerprint
    * is a stored column at ingest and this is a pure key groupBy;
    * near-dup (small hamming distance) extends via d03's band
    * blocking on the same bits. */
  def m06AudioDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashed = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        (id, audioFpBits(wavPayload(id % 89)))
      }).toDF("doc_id", "afp")
    val groups = hashed.groupBy("afp")
      .agg(count(lit(1)).as("n_group"), min("doc_id").as("rep_id"))
    hashed.join(groups, "afp")
      .select("doc_id", "afp", "rep_id", "n_group")
      .orderBy("doc_id")
  }

  val m06OracleSql: String =
    """WITH p AS (
      |  SELECT doc_id, doc_id % 89 AS sd, (doc_id % 89) % 2000 + 500 AS n
      |  FROM documents
      |), samp AS (
      |  SELECT doc_id, n // 64 AS w, i,
      |         ABS(((sd * 2654435761 + 1013904223 * i) % 65536) - 32768) AS a
      |  FROM p, LATERAL unnest(generate_series(0, (n // 64) * 64 - 1)) AS t(i)
      |), win AS (
      |  SELECT doc_id, i // w AS k, SUM(a) AS e
      |  FROM samp GROUP BY doc_id, i // w
      |), b AS (
      |  SELECT doc_id, k,
      |         CASE WHEN e * 64 > SUM(e) OVER (PARTITION BY doc_id)
      |              THEN '1' ELSE '0' END AS bit
      |  FROM win
      |), fp AS (
      |  SELECT doc_id, string_agg(bit, '' ORDER BY k) AS afp
      |  FROM b GROUP BY doc_id
      |), grp AS (
      |  SELECT afp, COUNT(*) AS n_group, MIN(doc_id) AS rep_id
      |  FROM fp GROUP BY afp
      |)
      |SELECT fp.doc_id, fp.afp, grp.rep_id, grp.n_group
      |FROM fp JOIN grp USING (afp)
      |ORDER BY fp.doc_id""".stripMargin

  // ------------------------------------------------------------ m07
  /** m07: SCENE DETECTION — the standard video-curation pass (cut
    * detection by inter-frame difference, the classic shot-boundary
    * method every frame-dedup/sampling pipeline runs before choosing
    * keyframes): treat the decoded pixel array as m03's sequence of
    * 192-byte frames, compute the sum of absolute byte differences
    * between consecutive frames, declare a CUT where the difference
    * exceeds [[SceneCutThresh]], and emit one row per resulting scene
    * (doc_id, scene_idx, start_frame, scene_frames) — the segmentation
    * a real pipeline feeds into per-scene keyframe sampling (m03) and
    * perceptual dedup (m05). On this payload the difference signal is
    * fully deterministic (byte i = (doc_id·31+7i) mod 256, so
    * consecutive-frame deltas are +64 mod 256 — the wrap count varies
    * by frame and the threshold sits between the two observed bands),
    * which keeps the operator oracle-exact like m01-m06.
    *
    * Scale shape: same as m03 — per-partition batch decode, payload
    * bytes never shuffle, each doc reduces to its scene rows (a
    * doc-bounded handful) before the output sort. */
  private[graft] val SceneCutThresh = 18500L

  /** Scene start frames of a decoded pixel array under m07's cut rule
    * (frame 0 + every frame whose abs-diff to its predecessor exceeds
    * [[SceneCutThresh]]) — shared by m07's segmentation and m09's
    * keyframe extraction so the two can never disagree on boundaries. */
  private[graft] def sceneStartsOf(pixels: Array[Byte]): IndexedSeq[Int] = {
    val frameLen = 192
    val nFrames = pixels.length / frameLen
    val cuts = (1 until nFrames).filter { f =>
      var diff = 0L
      var i = 0
      while (i < frameLen) {
        diff += math.abs((pixels(f * frameLen + i) & 0xff) -
          (pixels((f - 1) * frameLen + i) & 0xff))
        i += 1
      }
      diff > SceneCutThresh
    }
    0 +: cuts
  }

  def m07SceneDetect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val frameLen = 192
    mediaFrames(s, d).flatMap { case (id, bytes) =>
      val img = decodePpm(bytes)
      val nFrames = img.pixels.length / frameLen
      val starts = sceneStartsOf(img.pixels)
      val ends = starts.drop(1) :+ nFrames
      starts.zip(ends).zipWithIndex.map { case ((st, en), idx) =>
        (id, idx, st, en - st)
      }
    }.toDF("doc_id", "scene_idx", "start_frame", "scene_frames")
      .orderBy("doc_id", "scene_idx")
  }

  val m07OracleSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |         CAST(doc_id % 64 + 16 AS INT) AS w,
       |         CAST(doc_id % 48 + 16 AS INT) AS h
       |  FROM documents
       |), nf AS (
       |  SELECT doc_id, (w*h*3) // 192 AS n_frames FROM m
       |), px AS (
       |  SELECT doc_id, unnest(generate_series(192, n_frames*192 - 1)) AS i
       |  FROM nf WHERE n_frames >= 2
       |), df AS (
       |  SELECT doc_id, i // 192 AS f,
       |         SUM(ABS((doc_id*31 + 7*i) % 256 - (doc_id*31 + 7*(i-192)) % 256)) AS diff
       |  FROM px GROUP BY 1, 2
       |), starts AS (
       |  SELECT doc_id, CAST(0 AS BIGINT) AS start_frame FROM nf WHERE n_frames >= 1
       |  UNION ALL
       |  SELECT doc_id, f FROM df WHERE diff > ${SceneCutThresh}
       |), seg AS (
       |  SELECT doc_id, start_frame,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_frame) - 1 AS scene_idx,
       |         LEAD(start_frame) OVER (PARTITION BY doc_id ORDER BY start_frame) AS next_start
       |  FROM starts
       |)
       |SELECT seg.doc_id, CAST(scene_idx AS INT) AS scene_idx,
       |       CAST(start_frame AS INT) AS start_frame,
       |       CAST(COALESCE(next_start, nf.n_frames) - start_frame AS INT) AS scene_frames
       |FROM seg JOIN nf USING (doc_id)
       |ORDER BY doc_id, scene_idx""".stripMargin

  // ------------------------------------------------------------ m08
  /** m08: IMAGE-TEXT PAIR FILTERING — the LAION curation gate
    * (Schuhmann 2021: keep a crawled (image, caption) pair only when
    * the CLIP image-embedding · text-embedding cosine clears a
    * threshold; LAION-400M shipped 0.3 and dropped ~90% of the
    * crawl). The Spark-side plumbing is the production shape
    * end-to-end: an image-side feature vector computed INSIDE the
    * scan-stage batch decode (payload bytes never shuffle — only the
    * 64-dim descriptor leaves the partition), joined on doc_id to the
    * stored text-side embedding table, one cosine kernel per pair, a
    * threshold verdict per pair. Only the ENCODERS are stand-ins
    * (this container has no ML runtime): the image embedding is the
    * real decode's 8×8 gray-cell descriptor (m05's integer visual
    * descriptor, a genuine downsampled-luminance feature) and the
    * text embedding is the embeddings table keyed by doc_id — swap
    * both for CLIP towers and nothing about the plan changes.
    *
    * Every pair is emitted with its score and verdict (which-pair-
    * was-dropped observability, t23's per-rule pattern) rather than
    * pre-filtered, so the oracle checks kept AND dropped rows. At
    * 100 TB both descriptor columns are stored at ingest and the
    * query is a co-partitioned join + one fused kernel per row; the
    * keep fraction here is ~20% (τ=0.10 on this data — LAION's 0.3
    * rescaled to the stand-in encoders' score distribution). */
  private[graft] val PairTau = 0.10

  def m08PairFilter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ivecs = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        // partition = batch: a real CLIP tower would init once here
        (id, cellGrays(ppmPayload(id)).map(_.toFloat))
      }).toDF("doc_id", "ivec")
    val tvecs = Tables.embeddings(s, d)
      .select(col("vec_id").as("doc_id"), col("embedding").as("tvec"))
    ivecs.join(tvecs, "doc_id")
      .select(col("doc_id"),
        round(graft.functions.cosine_sim(col("ivec"), col("tvec")), 4)
          .as("align_score"))
      .withColumn("kept", col("align_score") >= PairTau)
      .orderBy("doc_id")
  }

  val m08OracleSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |         CAST(doc_id % 64 + 16 AS INT) AS w,
       |         CAST(doc_id % 48 + 16 AS INT) AS h
       |  FROM documents
       |), cells AS (
       |  SELECT doc_id, j,
       |         ((((j // 8) * h // 8) * w + ((j % 8) * w // 8)) * 3) AS si
       |  FROM m, LATERAL unnest(generate_series(0, 63)) AS t(j)
       |), g AS (
       |  SELECT doc_id, j,
       |         CAST((doc_id*31 + 7*si) % 256 + (doc_id*31 + 7*(si+1)) % 256
       |           + (doc_id*31 + 7*(si+2)) % 256 AS DOUBLE) AS gray
       |  FROM cells
       |), iv AS (
       |  SELECT doc_id, list(gray ORDER BY j) AS ivec FROM g GROUP BY doc_id
       |), sc AS (
       |  SELECT iv.doc_id,
       |         ROUND(list_cosine_similarity(iv.ivec,
       |           list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 4) AS align_score
       |  FROM iv JOIN embeddings e ON iv.doc_id = e.vec_id
       |)
       |SELECT doc_id, align_score, align_score >= ${PairTau} AS kept
       |FROM sc ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ m09
  /** aHash bits of ONE 192-byte frame (64 RGB pixels) at `off` in a
    * decoded pixel array — m05's integer aHash rule applied at frame
    * granularity (a frame is already 8×8-sized, so no resample):
    * gray = r+g+b per pixel, bit = `gray·64 > frame total` (pure
    * integers, bit-identical on any engine). */
  private[graft] def frameHashBits(px: Array[Byte], off: Int): String = {
    val grays = new Array[Int](64)
    var total = 0
    var j = 0
    while (j < 64) {
      val i = off + j * 3
      grays(j) = (px(i) & 0xff) + (px(i + 1) & 0xff) + (px(i + 2) & 0xff)
      total += grays(j)
      j += 1
    }
    val bits = new java.lang.StringBuilder(64)
    var k = 0
    while (k < 64) { bits.append(if (grays(k) * 64 > total) '1' else '0'); k += 1 }
    bits.toString
  }

  /** m09: KEYFRAME DEDUP — the pass that completes the video-curation
    * arc (m03 samples frames → m07 segments scenes → m09 dedups the
    * library at SCENE granularity): each scene contributes its first
    * frame as the keyframe, the keyframe reduces to a 64-bit perceptual
    * hash ([[frameHashBits]], m05's aHash rule at frame granularity),
    * and the d01 groupBy on the hash finds re-used footage ACROSS
    * videos — intros, stock clips, re-uploads — that whole-file or
    * whole-image dedup (m05) cannot see because the containers differ.
    * The representative is the lexicographically first (doc, scene)
    * carrying the hash, encoded as one integer key (doc·1024+scene —
    * scene counts are ≤78 on any payload here) so a single MIN
    * expresses the argmin with no struct-ordering dependence.
    *
    * Scale shape: segmentation + hashing happen INSIDE the scan-stage
    * batch decode (payload bytes never shuffle — each video reduces to
    * its scene-count-bounded hash rows); the dedup exchange carries
    * (64-bit hash, doc, scene) only, map-side combined. The media seed
    * is doc_id mod 97 (m05's library), so genuinely duplicated scenes
    * exist at every SF. At 100 TB keyframe hashes are stored columns
    * written at ingest and this is a pure key groupBy; near-dup
    * (hamming ≤ 3) extends via d03's band blocking on the same bits. */
  def m09KeyframeDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val frameLen = 192
    val kf = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val img = decodePpm(ppmPayload(id % 97))
        sceneStartsOf(img.pixels).zipWithIndex.map { case (st, idx) =>
          (id, idx, st, frameHashBits(img.pixels, st * frameLen))
        }
      }).toDF("doc_id", "scene_idx", "start_frame", "kf_hash")
    val groups = kf.groupBy("kf_hash")
      .agg(count(lit(1)).as("n_group"),
        min(col("doc_id") * 1024 + col("scene_idx")).as("rep_key"))
    kf.join(groups, "kf_hash")
      .select(col("doc_id"), col("scene_idx"), col("start_frame"), col("kf_hash"),
        shiftright(col("rep_key"), 10).as("rep_doc"),
        (col("rep_key") % 1024).cast("int").as("rep_scene"),
        col("n_group"))
      .orderBy("doc_id", "scene_idx")
  }

  val m09OracleSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, doc_id % 97 AS sd,
       |         CAST((doc_id % 97) % 64 + 16 AS INT) AS w,
       |         CAST((doc_id % 97) % 48 + 16 AS INT) AS h
       |  FROM documents
       |), nf AS (
       |  SELECT doc_id, sd, (w*h*3) // 192 AS n_frames FROM m
       |), px AS (
       |  SELECT doc_id, sd, unnest(generate_series(192, n_frames*192 - 1)) AS i
       |  FROM nf WHERE n_frames >= 2
       |), df AS (
       |  SELECT doc_id, i // 192 AS f,
       |         SUM(ABS((sd*31 + 7*i) % 256 - (sd*31 + 7*(i-192)) % 256)) AS diff
       |  FROM px GROUP BY 1, 2
       |), starts AS (
       |  SELECT doc_id, CAST(0 AS BIGINT) AS start_frame FROM nf
       |  UNION ALL
       |  SELECT doc_id, f FROM df WHERE diff > ${SceneCutThresh}
       |), seg AS (
       |  SELECT doc_id, start_frame,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_frame) - 1
       |           AS scene_idx
       |  FROM starts
       |), g AS (
       |  SELECT s.doc_id, s.scene_idx, s.start_frame, t.j,
       |         (m.sd*31 + 7*(s.start_frame*192 + t.j*3)) % 256
       |           + (m.sd*31 + 7*(s.start_frame*192 + t.j*3 + 1)) % 256
       |           + (m.sd*31 + 7*(s.start_frame*192 + t.j*3 + 2)) % 256 AS gray
       |  FROM seg s JOIN m USING (doc_id),
       |       LATERAL unnest(generate_series(0, 63)) AS t(j)
       |), b AS (
       |  SELECT doc_id, scene_idx, start_frame, j,
       |         CASE WHEN gray * 64 > SUM(gray) OVER (PARTITION BY doc_id, scene_idx)
       |              THEN '1' ELSE '0' END AS bit
       |  FROM g
       |), kf AS (
       |  SELECT doc_id, CAST(scene_idx AS INT) AS scene_idx,
       |         CAST(start_frame AS INT) AS start_frame,
       |         string_agg(bit, '' ORDER BY j) AS kf_hash
       |  FROM b GROUP BY doc_id, scene_idx, start_frame
       |), grp AS (
       |  SELECT kf_hash, COUNT(*) AS n_group,
       |         MIN(doc_id * 1024 + scene_idx) AS rep_key
       |  FROM kf GROUP BY kf_hash
       |)
       |SELECT kf.doc_id, kf.scene_idx, kf.start_frame, kf.kf_hash,
       |       grp.rep_key // 1024 AS rep_doc,
       |       CAST(grp.rep_key % 1024 AS INT) AS rep_scene, grp.n_group
       |FROM kf JOIN grp USING (kf_hash)
       |ORDER BY kf.doc_id, kf.scene_idx""".stripMargin

  // ------------------------------------------------------------ e11
  /** e11: the IMAGE pipeline composed end-to-end as ONE Catalyst plan —
    * what e06 is for text (decode → m08's pair gate → m05's hash dedup
    * → survivors manifest). The production property is the SINGLE
    * DECODE: both the pair-gate descriptor (the 64-cell gray vector)
    * and the dedup hash (its aHash bits) come out of one scan-stage
    * batch decode per asset — payload bytes never shuffle, never
    * decode twice (spec-asserted: the plan scans documents ONCE,
    * embeddings once, and runs one object stage). Stage order is the
    * cascade's: the alignment gate runs FIRST (cheap descriptor
    * cosine against the stored text embedding), dedup groups only the
    * KEPT rows (the d01 groupBy on the hash), and each kept row
    * reports its group's representative + a survivor verdict — the
    * curated-library manifest with which-asset-was-dropped
    * observability. Media library = m05's (doc_id mod 97), so
    * genuinely duplicated assets exist at every SF; the text side is
    * the stored embeddings table (m08's stand-in contract: swap the
    * descriptor for a CLIP tower and the plan is unchanged). */
  def e11MultimodalCurate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val feats = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val cells = cellGrays(ppmPayload(id % 97)) // ONE decode
        (id, cells.map(_.toFloat), phashBitsOfCells(cells))
      }).toDF("doc_id", "ivec", "phash")
    val tvecs = Tables.embeddings(s, d)
      .select(col("vec_id").as("doc_id"), col("embedding").as("tvec"))
    val kept = feats.join(tvecs, "doc_id")
      .select(col("doc_id"),
        round(graft.functions.cosine_sim(col("ivec"), col("tvec")), 4)
          .as("align_score"),
        col("phash"))
      .filter(col("align_score") >= PairTau) // the gate runs first
    // group stats as a WINDOW over the kept rows (not a groupBy +
    // self-join, which would duplicate the decode subtree and scan the
    // media twice): one phash-keyed exchange, keys are hash-fine so no
    // skew, and the single-decode property holds in the plan
    val w = org.apache.spark.sql.expressions.Window.partitionBy("phash")
    kept
      .withColumn("rep_id", min("doc_id").over(w))
      .withColumn("n_group", count(lit(1)).over(w))
      .select(col("doc_id"), col("align_score"), col("phash"),
        col("rep_id"), col("n_group"),
        (col("doc_id") === col("rep_id")).as("survivor"))
      .orderBy("doc_id")
  }

  val e11OracleSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, doc_id % 97 AS sd,
       |         CAST((doc_id % 97) % 64 + 16 AS INT) AS w,
       |         CAST((doc_id % 97) % 48 + 16 AS INT) AS h
       |  FROM documents
       |), cells AS (
       |  SELECT doc_id, sd, j,
       |         ((((j // 8) * h // 8) * w + ((j % 8) * w // 8)) * 3) AS si
       |  FROM m, LATERAL unnest(generate_series(0, 63)) AS t(j)
       |), g AS (
       |  SELECT doc_id, j,
       |         (sd*31 + 7*si) % 256 + (sd*31 + 7*(si+1)) % 256
       |           + (sd*31 + 7*(si+2)) % 256 AS gray
       |  FROM cells
       |), iv AS (
       |  SELECT doc_id, list(CAST(gray AS DOUBLE) ORDER BY j) AS ivec
       |  FROM g GROUP BY doc_id
       |), b AS (
       |  SELECT doc_id, j,
       |         CASE WHEN gray * 64 > SUM(gray) OVER (PARTITION BY doc_id)
       |              THEN '1' ELSE '0' END AS bit
       |  FROM g
       |), ph AS (
       |  SELECT doc_id, string_agg(bit, '' ORDER BY j) AS phash
       |  FROM b GROUP BY doc_id
       |), kept AS (
       |  SELECT iv.doc_id,
       |         ROUND(list_cosine_similarity(iv.ivec,
       |           list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 4) AS align_score,
       |         ph.phash
       |  FROM iv
       |  JOIN embeddings e ON iv.doc_id = e.vec_id
       |  JOIN ph ON iv.doc_id = ph.doc_id
       |  WHERE ROUND(list_cosine_similarity(iv.ivec,
       |          list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 4) >= ${PairTau}
       |), grp AS (
       |  SELECT phash, COUNT(*) AS n_group, MIN(doc_id) AS rep_id
       |  FROM kept GROUP BY phash
       |)
       |SELECT k.doc_id, k.align_score, k.phash, grp.rep_id, grp.n_group,
       |       (k.doc_id = grp.rep_id) AS survivor
       |FROM kept k JOIN grp USING (phash)
       |ORDER BY k.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e11_multimodal_curate" -> (e11MultimodalCurate _),
    "m07_scene_detect" -> (m07SceneDetect _),
    "m08_pair_filter"  -> (m08PairFilter _),
    "m09_keyframe_dedup" -> (m09KeyframeDedup _),
    "m01_multimodal"   -> (m01Multimodal _),
    "m02_resize"       -> (m02Resize _),
    "m03_frame_sample" -> (m03FrameSample _),
    "m04_audio"        -> (m04Audio _),
    "m05_image_dedup"  -> (m05ImageDedup _),
    "m06_audio_dedup"  -> (m06AudioDedup _))

  /** All three are oracle-exact: the pixel byte at index i is
    * (doc_id*31 + 7*i) mod 256, so DuckDB regenerates the array with
    * generate_series and recomputes the decoded sums, the
    * nearest-neighbor mapping (pure integer division), and the P6
    * header length (9 + digits(w) + digits(h)) bit-for-bit. SUMs cast
    * to BIGINT (DuckDB sums integers into HUGEINT). */
  val oracleSql: Map[String, String] = Map(
    "e11_multimodal_curate" -> e11OracleSql,
    "m01_multimodal" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(doc_id % 64 + 16 AS INT) AS w,
        |         CAST(doc_id % 48 + 16 AS INT) AS h
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, w, h, unnest(generate_series(0, w*h*3 - 1)) AS i FROM m
        |)
        |SELECT doc_id, 'ppm' AS format, w AS width, h AS height,
        |       CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
        |              + w*h*3 AS INT) AS n_bytes,
        |       CAST(SUM(CASE WHEN i % 3 = 0 THEN (doc_id*31 + 7*i) % 256 END) AS BIGINT) AS sum_r,
        |       CAST(SUM(CASE WHEN i % 3 = 1 THEN (doc_id*31 + 7*i) % 256 END) AS BIGINT) AS sum_g,
        |       CAST(SUM(CASE WHEN i % 3 = 2 THEN (doc_id*31 + 7*i) % 256 END) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    "m02_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(doc_id % 64 + 16 AS INT) AS w,
        |         CAST(doc_id % 48 + 16 AS INT) AS h
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, w, h,
        |         GREATEST(1, CAST(FLOOR(w * LEAST(32.0/w, 32.0/h)) AS INT)) AS ow,
        |         GREATEST(1, CAST(FLOOR(h * LEAST(32.0/w, 32.0/h)) AS INT)) AS oh
        |  FROM m
        |), px AS (
        |  SELECT doc_id, w, h, ow, oh,
        |         unnest(generate_series(0, ow*oh*3 - 1)) AS j
        |  FROM o
        |), v AS (
        |  SELECT doc_id, w, h, ow, oh,
        |         (((((j // 3) // ow) * h // oh) * w
        |            + (((j // 3) % ow) * w // ow)) * 3 + j % 3) AS si
        |  FROM px
        |)
        |SELECT doc_id, w AS width, h AS height, ow AS out_width, oh AS out_height,
        |       CAST(9 + length(CAST(ow AS VARCHAR)) + length(CAST(oh AS VARCHAR))
        |              + ow*oh*3 AS INT) AS n_bytes_out,
        |       CAST(SUM((doc_id*31 + 7*si) % 256) AS BIGINT) AS sum_out
        |FROM v GROUP BY doc_id, w, h, ow, oh ORDER BY doc_id""".stripMargin,
    "m03_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(doc_id % 64 + 16 AS INT) AS w,
        |         CAST(doc_id % 48 + 16 AS INT) AS h
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, unnest(generate_series(0, (w*h*3) // 192 - 1)) AS fi FROM m
        |), sel AS (
        |  SELECT doc_id, fi FROM f WHERE fi % 4 = 0
        |), px AS (
        |  SELECT doc_id, fi, unnest(generate_series(fi*192, fi*192 + 191)) AS i FROM sel
        |)
        |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |       CAST(SUM((doc_id*31 + 7*i) % 256) AS BIGINT) AS frame_sum
        |FROM px GROUP BY doc_id, fi ORDER BY doc_id, frame_idx""".stripMargin,
    "m04_audio" -> m04OracleSql,
    "m05_image_dedup" -> m05OracleSql,
    "m06_audio_dedup" -> m06OracleSql,
    "m07_scene_detect" -> m07OracleSql,
    "m08_pair_filter" -> m08OracleSql,
    "m09_keyframe_dedup" -> m09OracleSql)
}

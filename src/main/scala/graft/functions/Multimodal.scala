package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads (image / audio /
  * video bytes) carried alongside typed metadata, with feature
  * extraction as a partition-parallel typed map.
  *
  * The container has no codec libraries, so `decodeStub` is a
  * CLEARLY-MARKED deterministic fake standing in for a real decoder
  * (JPEG dims, audio duration, frame sampling). Everything around it —
  * the schema, the `Dataset[MediaRecord]` encoder, the mapPartitions
  * batch shape (decoder state constructed once per partition, streamed
  * over rows, never materializing the partition), and the
  * spill-friendly binary column layout — is the real production shape:
  * swap `decodeStub` for a codec call and nothing else changes.
  *
  * Scale notes (100 TB): payloads stay in executor space end-to-end
  * (no collect); per-partition decoder init amortizes model/codec
  * loading exactly like a Pandas-UDF batch would; downstream feature
  * columns are plain Spark types so Catalyst can prune/push as usual.
  */
object Multimodal {

  /** A media row: opaque bytes + source metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features; `width/height/duration` come from the decoder
    * (stubbed here), `n_bytes/checksum` from the raw payload. */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      width: Int, height: Int, duration_ms: Long)

  /** REAL image-header decode (r6): parses PNG (signature + IHDR) and
    * JPEG (SOI, then a generic marker walk over APPn/COM/DQT/… segments
    * until SOF0/1/2) from the leading bytes — pure public-format byte
    * arithmetic, no codec library. Returns (format, width, height), or
    * None when the payload is not a recognizable image. The SQL twin
    * (expression-only, oracle-able) is the `mm_headers` key in
    * TrainQueries; this form handles arbitrarily many JPEG segments. */
  def decodeImageHeader(payload: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (payload.length >= 24 &&
        pngSig.indices.forall(i => u8(i) == pngSig(i)) &&
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')
      Some(("png", be32(16), be32(20)))
    else if (payload.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // Marker walk: every segment is FF <marker> <be16 len incl. the
      // two length bytes>; SOFn frames carry precision, H, W after the
      // length. Stops at SOS/EOI (entropy data follows, no frame seen).
      // The spec allows any number of 0xFF FILL bytes before a marker
      // (B.1.1.2) — skip them instead of parsing fill as a marker with
      // a garbage length. Frame markers are the FULL SOFn range
      // 0xC0–0xCF minus DHT(0xC4)/JPG(0xC8)/DAC(0xCC): baseline,
      // progressive, AND lossless/arithmetic/differential frames all
      // carry (precision, H, W) in the same layout (r6 advice — SOF3/
      // 5-7/9-15 previously fell through to the generic-segment arm).
      var i = 2
      while (i + 3 < payload.length && u8(i) == 0xff) {
        if (u8(i + 1) == 0xff) { i += 1 } // fill byte, not a marker
        else {
          val m = u8(i + 1)
          val isSof = m >= 0xc0 && m <= 0xcf &&
            m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (i + 8 < payload.length)
              return Some(("jpeg", be16(i + 7), be16(i + 5)))
            else return None
          } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
            i += 2 // standalone markers carry no length field
          } else if (m == 0xd9 || m == 0xda) {
            return None // EOI / start-of-scan before any SOF frame
          } else {
            i += 2 + be16(i + 2)
          }
        }
      }
      None
    } else None
  }

  /** Decoder for the typed path: images go through the REAL header
    * parse first (`decodeImageHeader`); payloads without a recognizable
    * header — and the audio/video kinds, whose codecs aren't in this
    * container — fall back to a CLEARLY-MARKED deterministic stub
    * derived from the payload size. The signature (bytes in, features
    * out) is the swap-in contract for a full codec binding. */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Long) = {
    val n = payload.length
    kind match {
      case "image" =>
        decodeImageHeader(payload) match {
          case Some((_, w, h)) => (w, h, 0L)
          case None            => (1 + n % 640, 1 + (7 * n) % 480, 0L)
        }
      case "audio" => (0, 0, 1000L + (n % 60000))
      case "video" => (1 + n % 1920, 1 + (3 * n) % 1080, 1000L + (n % 600000))
      case _       => (0, 0, 0L)
    }
  }

  /** 64-bit FNV-1a over the payload — cheap integrity checksum, and
    * the dedup key for byte-identical payloads at scale. */
  def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    h
  }

  /** Partition-parallel feature extraction. The decoder "session" is
    * created once per partition (the expensive-init pattern), then the
    * row iterator streams through it. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder init would go here (load codec/model once)
      it.map { r =>
        val (w, h, d) = decodeStub(r.kind, r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          fnv1a(r.payload), w, h, d)
      }
    }
  }

  /** Build a media Dataset from the documents table, treating text
    * bytes as the opaque payload (fixtures carry no real media). */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id".as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod($"doc_id", lit(3)) + 1).cast(IntegerType)).as("kind"),
        $"text".cast(BinaryType).as("payload"))
      .as[MediaRecord]
  }

  /** DataFrame view of the full pipeline (for ad-hoc use / tests). */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(fromDocuments(spark, sfDir)).toDF()
}

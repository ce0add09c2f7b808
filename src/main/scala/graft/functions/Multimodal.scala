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

  /** STUB decoder — deterministic fake: derives plausible dimensions /
    * duration from payload bytes. Replace with a real codec binding;
    * the signature (bytes in, features out) is the contract. */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Long) = {
    val n = payload.length
    kind match {
      case "image" => (1 + n % 640, 1 + (7 * n) % 480, 0L)
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

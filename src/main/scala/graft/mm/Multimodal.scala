package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.3).
  *
  * Media (image/audio/video) is carried as an opaque `binary` column
  * with typed metadata alongside. The Spark-side machinery — schema,
  * partition spreading, batch-shaped decode boundary — is real; the
  * codec in THIS file is STUBBED with a deterministic fake (this
  * container has no native image/audio libraries), clearly marked
  * below. Swapping in a real decoder changes only the body of
  * `fakeDecode` — and [[Codecs]] proves it: the same per-partition
  * seam runs the JDK's genuine PNG (`javax.imageio`) and WAV
  * (`javax.sound.sampled`) codecs end-to-end for the
  * `multimodal_png_codec` / `multimodal_wav_codec` contract queries.
  */
object Multimodal {

  /** Decoded media metadata produced by the (stubbed) decoder. */
  case class MediaMeta(doc_id: Long, width: Int, height: Int, n_frames: Int)

  /** Attach the opaque payload + cheap byte-level metadata. In a real
    * pipeline the binary arrives from the source; here text bytes stand
    * in as the payload. */
  def withPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("sha", sha2(col("payload"), 256))

  /** STUB decoder — deterministic fake in place of a real image/video
    * codec. Real decode would parse the container header; the fake
    * derives dimensions from the first payload bytes so tests are
    * reproducible. Runs per-partition, batch-shaped: the iterator lets
    * an implementation amortize codec init across a whole partition
    * (the same shape a Pandas-UDF/Arrow batch would have). */
  private def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    val b1 = if (payload.length > 1) payload(1) & 0xff else 0
    MediaMeta(
      doc_id = docId,
      width = 16 * (1 + (b0 % 32)),
      height = 16 * (1 + (b1 % 32)),
      n_frames = 1 + (payload.length % 8))
  }

  /** STUB feature extractor — fixed-width embedding from payload bytes
    * (a real implementation runs a vision/audio encoder over the
    * decoded media; the batch shape and schema are what matter here).
    * Accumulates in exact integer arithmetic with a single final
    * divide, so the values are bit-reproducible by the SQL oracle
    * (float-accumulation order would not be). */
  def fakeFeatures(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    val sums = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      sums(i % dim) += (payload(i) & 0xff)
      i += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) { out(j) = (sums(j) / 255.0).toFloat; j += 1 }
    out
  }

  /** STUB resize — recompute metadata for a bounded box, preserving
    * aspect ratio (real impl: pixel resample on the decoded frame). */
  def resizeMeta(m: MediaMeta, maxSide: Int): MediaMeta = {
    val scale = math.min(1.0, maxSide.toDouble / math.max(m.width, m.height))
    m.copy(width = math.max(1, (m.width * scale).round.toInt),
      height = math.max(1, (m.height * scale).round.toInt))
  }

  /** Frame sampling plan: n evenly spaced frame indices (real impl:
    * seek+decode those frames; the selection logic is the real part). */
  def sampleFrames(nFrames: Int, n: Int): Seq[Int] = {
    if (nFrames <= n) 0 until nFrames
    else (0 until n).map(i => (i.toLong * nFrames / n).toInt)
  }

  /** STUB audio chunker — treats payload bytes as centered 8-bit PCM
    * (a real implementation decodes the container and resamples; the
    * chunking/energy contract around it is the real part). Scans only
    * the first `maxBytes` (the preview-scan pattern — bounded work per
    * doc regardless of media size) in fixed `chunk`-sample windows and
    * returns each window's energy Σ(sample²) in EXACT integer
    * arithmetic, so the SQL oracle replays it bit-for-bit. */
  def fakeAudioChunks(payload: Array[Byte], chunk: Int = 256,
      maxBytes: Int = 512): Seq[(Int, Long)] =
    payload.take(maxBytes).grouped(chunk).zipWithIndex.map {
      case (cs, i) =>
        var e = 0L
        cs.foreach { b => val s = (b & 0xff) - 128; e += s.toLong * s }
        (i, e)
    }.toSeq

  /** Feature-extraction boundary over the decode output: payload →
    * embedding rows, per-partition batches. */
  def extractFeatures(spark: SparkSession, withBin: DataFrame): DataFrame = {
    import spark.implicits._
    withBin.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, fakeFeatures(bytes)) })
      .toDF("doc_id", "features")
  }

  /** Decode boundary: binary payload → typed metadata, per-partition.
    * Partitions are spread by doc_id first so a handful of giant media
    * files can't serialize behind one another on a single core. */
  def decode(spark: SparkSession, withBin: DataFrame,
      partitions: Int = 0): Dataset[MediaMeta] = {
    import spark.implicits._
    val spread =
      if (partitions > 0) withBin.repartition(partitions, col("doc_id"))
      else withBin
    spread
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => fakeDecode(id, bytes) } }
  }
}

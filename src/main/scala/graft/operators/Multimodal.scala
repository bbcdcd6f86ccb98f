package graft.operators

import org.apache.spark.sql.{Column, Dataset, Encoder, Row}
import org.apache.spark.sql.functions._

import graft.functions.hashes

/** Multimodal (image/audio/video) column handling: media travels as
  * an opaque `binary` column plus typed metadata; decode and
  * feature-extraction run batched per partition so a real codec
  * library amortizes its init cost across a partition's rows.
  *
  * The actual codecs are NOT available in this environment, so the
  * decode kernel is STUBBED ([[featuresStub]] — a deterministic fake,
  * clearly marked). Everything around it — the envelope schema, magic-
  * byte sniffing, frame sampling, the per-partition batching seam, the
  * feature-vector shape feeding the similarity operators — is real
  * Spark plumbing and is what the tests/queries exercise.
  */
object Multimodal {

  /** Magic-byte MIME sniffing (the only content inspection that does
    * not require a codec). */
  def sniffMime(payload: Column): Column =
    when(hex(substring(payload, 1, 2)) === "FFD8", "image/jpeg")
      .when(hex(substring(payload, 1, 4)) === "89504E47", "image/png")
      .when(hex(substring(payload, 1, 4)) === "52494646", "audio/wav")
      .otherwise("application/octet-stream")

  /** Typed media metadata struct: mime + size (a real pipeline adds
    * width/height/duration from the decoder). */
  def mediaMetadata(payload: Column): Column =
    struct(
      sniffMime(payload).as("mime"),
      octet_length(payload).as("n_bytes"))

  /** Frame sampling: cut the payload into `frameSize`-byte frames,
    * keeping at most `maxFrames` (uniform-from-start sampling). Pure
    * codegen'd expression — array<binary> out, zero shuffle. */
  def frameSample(payload: Column, frameSize: Int, maxFrames: Int): Column = {
    val nFrames = least(
      ceil(octet_length(payload).cast("double") / frameSize).cast("int"),
      lit(maxFrames))
    when(octet_length(payload) === 0, array().cast("array<binary>"))
      .otherwise(transform(
        sequence(lit(0), greatest(nFrames - 1, lit(0))),
        i => substring(payload, (i * frameSize + 1).cast("int"), lit(frameSize))))
  }

  /** ======= STUB =======
    * Deterministic fake "decode + feature-extract": k pseudo-features
    * in [0,1) derived from the payload's base64 via the oracle-
    * mirrorable md5 hash. A real implementation replaces THIS function
    * only (e.g. with a JNI codec invoked through [[decodePartitions]]);
    * the schema and the downstream similarity operators are unchanged. */
  def featuresStub(payload: Column, k: Int): Column = {
    val b64 = base64(payload)
    transform(sequence(lit(0), lit(k - 1)),
      i => (hashes.md5Hash60(concat(b64, lit("#"), i.cast("string")))
        % 1000L).cast("double") / 1000.0)
  }

  /** ======= STUB =======
    * Deterministic fake "resize": byte-stride downsampling to at most
    * `targetBytes` (byte i·k for k = ceil(n/target)) — binary in,
    * smaller binary out, preserving the column shape a real pixel
    * resize would have. Positions past the payload produce empty
    * slices, so short payloads pass through unchanged. Real
    * implementation swaps the kernel, not the plumbing (same as
    * [[featuresStub]]). */
  def resizeStub(payload: Column, targetBytes: Int): Column = {
    val stride = greatest(
      ceil(octet_length(payload).cast("double") / targetBytes).cast("int"),
      lit(1))
    // transform + fold, NOT a targetBytes-wide literal concat: the
    // expression tree stays constant-depth, so a realistic target
    // (64 KiB) cannot blow up analysis time or generated-method size
    aggregate(
      transform(sequence(lit(0), lit(targetBytes - 1)),
        i => substring(payload, (i * stride + 1).cast("int"), lit(1))),
      lit(Array.emptyByteArray),
      (acc, b) => concat(acc, b))
  }

  /** The per-partition batching seam a REAL codec plugs into: one
    * `decode` call per partition, iterator-to-iterator (no
    * materialization), so codec/library init happens once per task —
    * the mapInPandas-style batch shape, in Scala. */
  def decodePartitions[T: Encoder](media: Dataset[Row],
      decode: Iterator[Row] => Iterator[T]): Dataset[T] =
    media.mapPartitions(decode)
}

package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Framing

/** The reference's `file` source shape (src/sources/file.rs + the
  * `framing` decoding options): discover files, frame the byte stream,
  * decode frames, attach file/position metadata for lineage.
  *
  * Spark-first split by framing mode:
  *
  *  - `lines` — newline framing rides Spark's SPLITTABLE text reader:
  *    one file fans out to many tasks, the 100-TB path for line logs.
  *  - `framed` — the stateful framings (character_delimited,
  *    octet_counting RFC 6587, 4-byte-BE length_delimited, varint
  *    length-delimited) need the byte stream in order, exactly like the
  *    reference's per-file stream reader: `binaryFile` scan (one row per
  *    file) → native [[graft.functions.FrameSplit]] → posexplode. The
  *    frame index is the in-file position analog (offset lineage);
  *    parallelism = number of files, the same unit the reference tails.
  *
  * Malformed framing yields a null frame array (fallible-decode
  * convention) — surfaced as zero frames plus a `frame_error` flag so a
  * dropped-lane route can pick the bad files up.
  */
object FileSource {

  /** Newline-framed lines with file lineage — splittable scan. */
  def lines(spark: SparkSession, glob: String): DataFrame =
    spark.read.textFile(glob).toDF("line")
      .select(input_file_name().as("path"), col("line"))

  /** Continuous tail of a directory of line files — the reference's file
    * source proper (it watches and tails): Spark's streaming text source
    * picks up NEW files per micro-batch and checkpoints which files were
    * read (the checkpointed-offsets analog of the reference's file
    * fingerprint/position db). Pair with the StreamOps stages and a
    * foreachBatch snapshot commit for the end-to-end exactly-once path.
    */
  def linesStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir)
      .select(input_file_name().as("path"), col("value").as("line"))

  /** Stateful framing over whole files: one row per frame, with
    * (path, frame_idx) lineage and a per-file error flag.
    */
  def framed(spark: SparkSession, glob: String, mode: String,
             delim: Byte = '\n'): DataFrame = {
    val files = spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("modificationTime"),
        Framing.frames(col("content"), mode, delim).as("frames"))
    files
      .select(col("path"), col("modificationTime"),
        col("frames").isNull.as("frame_error"),
        posexplode_outer(coalesce(col("frames"),
          array().cast("array<binary>"))).as(Seq("frame_idx", "frame")))
  }
}

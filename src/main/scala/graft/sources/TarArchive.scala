package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TAR-shard source — WebDataset-style training-data ingestion. The
  * dominant interchange for multimodal training corpora is a directory
  * of `.tar` shards whose members group into samples by basename
  * (`000123.jpg` + `000123.json` + `000123.txt` = one sample; the
  * public WebDataset convention). This reader turns a directory of
  * shards into (archive, member, bytes) rows and [[samples]] regroups
  * them — feeding [[graft.multimodal.Multimodal]]'s decoders without
  * unpacking anything to disk.
  *
  * Format per the POSIX ustar spec: 512-byte headers (name 0:100,
  * octal size 124:12, typeflag 156, magic "ustar" 257:5, prefix
  * 345:155), data in 512-byte blocks, archive ends at two zero blocks.
  * Regular files (typeflag '0'/NUL) become rows; directories and other
  * typeflags are skipped STRUCTURALLY (their size is still consumed,
  * so following members stay framed). A malformed header (bad magic /
  * unparsable size) stops that archive at the corruption point and
  * emits a `_malformed` row — the [[Shapefile]]/[[JsonLines]]
  * quarantine contract. GNU long-name/base-256-size extensions are
  * outside the contract.
  *
  * Distribution model: `binaryFile` rows, one ARCHIVE per row, parsed
  * executor-side (tar framing is sequential; shards are the unit of
  * parallelism — exactly why WebDataset shards exist). A 100 TB corpus
  * in 1 GB shards is 100k parallel rows — the intended shape.
  */
object TarArchive {

  val RescueCol = "_malformed"

  case class TarMember(archive: String, ordinal: Int, member: String,
      size: Long, content: Array[Byte], _malformed: String)

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    val end = {
      val i = b.indexOf(0.toByte, off)
      if (i < 0 || i >= off + len) off + len else i
    }
    new String(b, off, end - off, StandardCharsets.US_ASCII)
  }

  private def octal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    val s = str(b, off, len).trim
    if (s.isEmpty) Some(0L)
    else if (s.forall(c => c >= '0' && c <= '7'))
      Some(java.lang.Long.parseLong(s, 8))
    else None
  }

  /** Parse one archive's bytes (pure; executor-side). `ordinal` is the
    * member's position in the archive — tar semantics let a later
    * member override an earlier same-path one, and [[samples]] resolves
    * such repeats deterministically by max ordinal. */
  private[sources] def parseTar(archive: String, bytes: Array[Byte]): Seq[TarMember] = {
    val out = Seq.newBuilder[TarMember]
    var off = 0
    var ord = 0
    var done = false
    while (!done && off + 512 <= bytes.length) {
      if (bytes.slice(off, off + 512).forall(_ == 0)) done = true // end blocks
      else {
        val magic = str(bytes, off + 257, 5)
        val sizeO = octal(bytes, off + 124, 12)
        if (magic != "ustar" || sizeO.isEmpty) {
          out += TarMember(archive, ord, null, 0L, null,
            s"bad header at offset $off (magic '$magic')")
          done = true // cannot re-frame past a corrupt header
        } else {
          val size = sizeO.get
          val name = {
            val prefix = str(bytes, off + 345, 155)
            val base = str(bytes, off, 100)
            if (prefix.isEmpty) base else s"$prefix/$base"
          }
          val typeflag = bytes(off + 156).toChar
          // ALL size arithmetic in Long: a corrupt 11-digit octal size
          // parses to ~8.6e9, and Int math would wrap it into a small
          // or negative extent that slips past the truncation check
          // (crashing copyOfRange or silently mis-framing what follows)
          val dataStart = off.toLong + 512L
          val dataEnd = dataStart + size
          if (dataEnd > bytes.length) {
            out += TarMember(archive, ord, name, size, null,
              s"truncated member (need $size bytes at $dataStart)")
            done = true
          } else {
            if (typeflag == '0' || typeflag == 0.toChar)
              out += TarMember(archive, ord, name, size,
                java.util.Arrays.copyOfRange(bytes, dataStart.toInt, dataEnd.toInt), null)
            // other typeflags: consume structurally, emit nothing
            off = (dataStart + ((size + 511L) / 512L) * 512L).toInt
          }
        }
      }
      ord += 1
    }
    out.result()
  }

  /** (archive, ordinal, member, size, content, _malformed) — one row
    * per regular-file member under `path` (glob `*.tar`). */
  def readMembers(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.tar").load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (p, b) => parseTar(p, b) }
      .toDF()
  }

  /** WebDataset regroup: members keyed by their PATH up to the
    * basename's first dot (directories stay part of the key, per the
    * WebDataset convention — `train/0001.jpg` and `val/0001.jpg` are
    * different samples); one row per sample with a deterministic
    * ext→bytes map. A member whose basename has NO dot (an
    * extension-less label file like `train/0001`, or a dotfile) is
    * keyed by its FULL path with `ext = ''` — never silently dropped
    * (the source's no-silent-drop contract); note this means
    * `train/0001` regroups into the same sample as `train/0001.jpg`,
    * which is the WebDataset reading of an ext-less sibling. A
    * repeated identical path inside one archive (tar append
    * semantics: the later member overrides) resolves to the LAST
    * occurrence by ordinal — without that dedup, `map_from_entries`
    * would throw DUPLICATE_MAP_KEY and fail the whole regroup. */
  def samples(members: DataFrame): DataFrame =
    members.filter(col(RescueCol).isNull)
      .select(col("archive"), col("ordinal"),
        // regexp_extract yields '' on no match → dotless basenames
        // fall through to the full member path
        when(regexp_extract(col("member"), "^(.*?[^/]+?)\\.[^/]*$", 1) === "",
          col("member"))
          .otherwise(regexp_extract(col("member"), "^(.*?[^/]+?)\\.[^/]*$", 1))
          .as("sample_key"),
        regexp_extract(col("member"), "[^/]+?\\.([^/]*)$", 1).as("ext"),
        col("content"))
      .groupBy(col("archive"), col("sample_key"), col("ext"))
      .agg(max_by(col("content"), col("ordinal")).as("content"))
      .groupBy(col("archive"), col("sample_key"))
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("ext"), col("content"))))).as("parts"))
}

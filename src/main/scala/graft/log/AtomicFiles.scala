package graft.log

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Atomic whole-file replacement — the ONE implementation of the
  * tmp+rename discipline both durable artifacts commit through
  * ([[TopicLog]]'s sidecars/markers and
  * [[graft.operators.LshIndex]]'s manifest/marker; r13 verdict asks
  * #1/#3/#7, unified from LshIndex's chaos-proven copy).
  *
  * Two hard-won rules are encoded here, each found by a chaos suite:
  *
  *  1. **The rename must be atomic on EVERY scheme.** On the LOCAL
  *     scheme Hadoop's `FileContext.rename(..., OVERWRITE)` is
  *     delete-then-rename — a reader racing the replace sees a WINDOW
  *     where the destination does not exist (r13 chaos-spec-found: a
  *     prober read `found: None` for the LSH marker mid-publish) — so
  *     `file:` goes through `java.nio.file.Files.move(ATOMIC_MOVE)`,
  *     which is rename(2). HDFS and object-store committers implement
  *     the overwrite rename atomically and keep the FileContext path.
  *  2. **The temp name must be TOKEN-UNIQUE.** A fixed scratch name
  *     (`<target>.tmp`) lets two racing writers of the same target
  *     interleave on one temp file — one renames the other's
  *     half-written bytes into place, and the reader parses a TORN
  *     file (worse than a missing one: it throws instead of falling
  *     back). Unique names make every rename land a WHOLE file;
  *     last-writer-wins picks which whole file, which is the contract
  *     every caller here already has.
  *
  * On `file:` the temp write itself also goes through `java.nio`
  * rather than the Hadoop LocalFileSystem: Hadoop's checksumming local
  * FS leaves a `.<name>.crc` twin next to every file it creates, and a
  * unique-named temp would orphan one twin per replace forever (the
  * rename below moves only the data file). Renamed-into-place
  * destinations never have a checksum twin, so readers are
  * unaffected.
  */
object AtomicFiles {

  /** Replace `dest` with `bytes`, atomically: write a token-unique
    * temp sibling, then one atomic rename. A concurrent reader of
    * `dest` sees the old bytes or the new bytes — never a missing
    * file, never a torn one. Concurrent replacers of the same `dest`
    * serialize to last-writer-wins, each landing a whole file. */
  def writeReplace(fs: FileSystem, conf: Configuration, dest: Path,
      bytes: Array[Byte]): Unit = {
    val tmp = new Path(dest.getParent,
      s".${dest.getName}.${java.util.UUID.randomUUID()}.tmp")
    if (fs.getScheme == "file") {
      val destFile = java.nio.file.Paths.get(dest.toUri.getPath)
      val tmpFile = java.nio.file.Paths.get(tmp.toUri.getPath)
      java.nio.file.Files.createDirectories(destFile.getParent)
      java.nio.file.Files.write(tmpFile, bytes)
      move(tmpFile, destFile)
    } else {
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      fcRename(fs, conf, tmp, dest)
    }
  }

  /** Atomically rename an ALREADY-WRITTEN temp file over `dest`. The
    * caller owns the temp's uniqueness (a token-unique name, or a
    * path no other writer can be using). */
  def replace(fs: FileSystem, conf: Configuration, tmp: Path,
      dest: Path): Unit =
    if (fs.getScheme == "file")
      move(java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(dest.toUri.getPath))
    else fcRename(fs, conf, tmp, dest)

  private def move(tmp: java.nio.file.Path, dest: java.nio.file.Path): Unit = {
    java.nio.file.Files.move(tmp, dest,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private def fcRename(fs: FileSystem, conf: Configuration, tmp: Path,
      dest: Path): Unit = {
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(dest),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}

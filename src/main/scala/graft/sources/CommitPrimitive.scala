package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** `[EXT]` The EXCLUSIVE-PUBLISH primitive behind every snapshot
  * commit: make `tmp`'s bytes visible at `target` iff `target` does
  * not already exist, ATOMICALLY — returning false (never replacing)
  * when a concurrent writer published first. This single call is the
  * commit point of the whole table format (the Iceberg
  * `HadoopTableOperations`/"atomic swap of the version file"
  * construction); everything above it — manifests, segments, retries,
  * rebase — assumes it cannot lose a committed version.
  *
  * Why pluggable: no one mechanism is atomic-exclusive everywhere.
  *
  *   - POSIX local filesystems: `rename(2)` REPLACES, so exists+rename
  *     is a TOCTOU hole (an observed lost-commit race); `link(2)`
  *     fails EEXIST with no window → [[CommitPrimitive.HardLink]].
  *   - HDFS: rename is atomic no-replace (returns false if the target
  *     exists) → [[CommitPrimitive.RenameNoReplace]].
  *   - Object stores (S3/GCS/ABFS): rename is copy+delete and
  *     REPLACES silently — exists+rename reopens the exact lost-commit
  *     race the hard link closes locally. The correct primitive is the
  *     store's CONDITIONAL PUT (S3 `If-None-Match: *`, GCS
  *     `ifGenerationMatch=0`, ABFS ETag `If-None-Match`), which lives
  *     in the store SDK, not in the generic FileSystem API — so the
  *     deployment registers it: [[CommitPrimitive.register]] with a
  *     [[CommitPrimitive.ConditionalPut]] wrapping the SDK call.
  *
  * Dispatch is by URI scheme ([[CommitPrimitive.forScheme]]):
  * `file` → HardLink; anything unregistered → RenameNoReplace, which
  * is CORRECT on HDFS-semantics filesystems and the historical
  * behavior everywhere else. A store whose rename replaces MUST
  * register a conditional-put (or lock-service) primitive before
  * multi-writer use — CommitPrimitiveSpec pins the lost-commit
  * interleaving that exists+rename permits on such a store and proves
  * a registered conditional put rejects it.
  */
trait CommitPrimitive {
  /** Publish `tmp` at `target` iff absent. True = this writer owns
    * `target`; false = lost the race (caller deletes `tmp`, surfaces
    * the conflict, and retries/rebases). Implementations must never
    * replace an existing `target` and must leave no partial `target`
    * visible on failure.
    */
  def publish(f: FileSystem, tmp: Path, target: Path): Boolean
}

object CommitPrimitive {

  /** POSIX `link(2)`: EEXIST if the target appeared, no window. */
  object HardLink extends CommitPrimitive {
    def publish(f: FileSystem, tmp: Path, target: Path): Boolean = {
      val t = java.nio.file.Paths.get(target.toUri.getPath)
      val s = java.nio.file.Paths.get(tmp.toUri.getPath)
      try { java.nio.file.Files.createLink(t, s); f.delete(tmp, false); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    }
  }

  /** exists+rename — atomic-exclusive ONLY where rename itself refuses
    * to replace (HDFS contract); on replace-on-rename stores the pair
    * has a TOCTOU window and a lost-commit race.
    */
  object RenameNoReplace extends CommitPrimitive {
    def publish(f: FileSystem, tmp: Path, target: Path): Boolean =
      !f.exists(target) && f.rename(tmp, target)
  }

  /** Adapter for stores exposing a conditional write: the deployment
    * supplies `putIfAbsent(fs, target, bytes) => Boolean` wrapping the
    * SDK call (S3 `If-None-Match: *`, GCS `ifGenerationMatch=0`, a
    * lock/catalog service, …). The adapter reads the staged tmp file,
    * attempts the conditional put, and removes the tmp on success —
    * manifest lists are O(#segments) bytes, so the driver-side read
    * is metadata-sized by construction.
    */
  final class ConditionalPut(
      putIfAbsent: (FileSystem, Path, Array[Byte]) => Boolean)
      extends CommitPrimitive {
    def publish(f: FileSystem, tmp: Path, target: Path): Boolean = {
      val in = f.open(tmp)
      val bytes =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
          buf.toByteArray
        } finally in.close()
      val won = putIfAbsent(f, target, bytes)
      if (won) f.delete(tmp, false)
      won
    }
  }

  @volatile private var registry: Map[String, CommitPrimitive] =
    Map("file" -> HardLink)

  /** Register the commit primitive for a URI scheme (e.g. `"s3a"` →
    * a [[ConditionalPut]] over the store SDK). Replaces any previous
    * registration; affects every subsequent commit in the JVM.
    */
  def register(scheme: String, p: CommitPrimitive): Unit =
    synchronized { registry += scheme -> p }

  def forScheme(scheme: String): CommitPrimitive =
    registry.getOrElse(scheme, RenameNoReplace)
}

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
  * `file` → HardLink; the object-store schemes (`s3a`/`gs`/`abfs`/…)
  * → [[CommitPrimitive.LeasePut]], a reference lease/lock-file
  * election built on the plain FileSystem API — multi-writer SAFE out
  * of the box, upgradeable to the store SDK's conditional put where
  * one is available (see LeasePut's caveats); anything else →
  * RenameNoReplace, which is CORRECT on HDFS-semantics filesystems.
  * CommitPrimitiveSpec pins the lost-commit interleaving that
  * exists+rename permits on a replace-on-rename store and proves both
  * a registered conditional put AND the lease election reject it.
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

  /** Reference LEASE/LOCK-FILE primitive for stores with neither an
    * atomic create-exclusive nor a no-replace rename, built from the
    * three operations every `FileSystem` has — unique-name write,
    * strongly-consistent list, delete. The PROPOSAL-ELECTION
    * construction (the file-only cousin of Iceberg/Hudi lock
    * providers):
    *
    *  1. refuse when `target` already exists;
    *  2. write a unique proposal `.props-<target>/<token>` (token =
    *     zero-padded wall-clock millis + '.' + UUID: unique and
    *     time-ordered);
    *  3. list the proposal dir. Proposals older than `leaseMs` are
    *     DEAD WINNERS (crashed between election and publish) — reap
    *     them. Win ONLY when no other live proposal carries a
    *     timestamp ≤ ours (strictly-earliest-visible — NOT smallest
    *     token: a late proposer with a same-millisecond smaller UUID
    *     must lose, or two writers could both see themselves elected);
    *  4. winner re-checks the target, renames tmp onto it (replace
    *     semantics are safe under exclusivity) and deletes its
    *     proposal; every loser deletes its proposal and returns false
    *     into the caller's conflict/retry path.
    *
    * Exclusivity argument: if B's put-then-list completed before A's
    * put, then A's list — which linearizes after A's put on a
    * strongly-consistent store (S3 is since 2020, GCS/ABFS always
    * were) — sees B's proposal; with synchronized clocks B's timestamp
    * is ≤ A's and A loses. CLOCK SKEW breaks that single-clock
    * argument (a late proposer with a slow clock writes a SMALLER
    * timestamp that the earlier winner's one-shot list never saw — both
    * elect), so a preliminary winner must additionally SETTLE: wait
    * `settleMs` after its own put, then RE-LIST and win only if still
    * strictly earliest. With `settleMs > 2 × worst-case skew` the
    * election is exclusive again: suppose A and B both reach the
    * rename. A's re-list missed B's proposal ⇒ B's put happened after
    * A's re-list ⇒ at least `settleMs` of real time after A's put ⇒
    * B's timestamp (its clock, within skew of real time) exceeds A's
    * by more than `settleMs − 2·skew` > 0 — but then B's OWN re-list,
    * which provably sees A's still-undeleted smaller proposal (A
    * deletes only after renaming, and the target re-check catches
    * that), makes B lose. Contradiction; at most one renames. An
    * all-lose round (same-ms tie) is livelock-safe: everyone returns
    * false, the commit layer retries, the next round re-elects.
    *
    * CAVEATS — why a registered store-native conditional put
    * ([[ConditionalPut]]) is still strictly better where an SDK is
    * available: the fence is a LEASE CLOCK, not a server token. A
    * winner paused longer than `leaseMs` between election and rename
    * can be reaped and double-publish over its successor (the
    * re-check narrows that window to one rename but cannot close it) —
    * size `leaseMs` far above worst-case pause, and `settleMs` above
    * 2× worst-case clock skew (the settle window is what removes the
    * old "deployment discipline" skew caveat; NTP-fleet skew is tens
    * of ms, the 2 s default covers two orders of magnitude more).
    * Proposals stamped further than `leaseMs` into the LOCAL future
    * (a writer with an insane clock crashed mid-election) are reaped
    * like stale ones — they could never win, but they would otherwise
    * linger forever.
    */
  class LeasePut(leaseMs: Long = 60000L, settleMs: Long = 2000L)
      extends CommitPrimitive {
    require(leaseMs > 0, s"LeasePut: leaseMs must be positive, got $leaseMs")
    require(settleMs >= 0, s"LeasePut: settleMs must be >= 0, got $settleMs")

    /** Injectable for the spec's skewed-clock simulation. */
    protected def now(): Long = System.currentTimeMillis()

    /** The settle wait — injectable so the spec can interleave two
      * writers deterministically at exactly this point.
      */
    protected def settle(): Unit = if (settleMs > 0) Thread.sleep(settleMs)

    private def tsOf(name: String): Long =
      try name.takeWhile(_ != '.').toLong
      catch { case _: NumberFormatException => Long.MaxValue }

    def publish(f: FileSystem, tmp: Path, target: Path): Boolean = {
      if (f.exists(target)) return false
      val propDir = new Path(target.getParent, s".props-${target.getName}")
      val myTs = now()
      val token = f"$myTs%020d.${java.util.UUID.randomUUID()}"
      val prop = new Path(propDir, token)
      f.mkdirs(propDir)
      val out = f.create(prop, false)
      try out.write(Array.emptyByteArray) finally out.close()

      def lose(): Boolean = { f.delete(prop, false); false }
      def election(): Option[Boolean] = {
        val names =
          try f.listStatus(propDir).map(_.getPath.getName).toSeq
          catch {
            // dir already gone: a winner published AND cleaned up since
            // our exists check — the target re-check below settles it
            case _: java.io.FileNotFoundException => Seq(token)
          }
        val nw = now()
        val (stale, live) = names.partition(n =>
          n != token &&
            (nw - tsOf(n) > leaseMs || tsOf(n) - nw > leaseMs))
        stale.foreach(n => f.delete(new Path(propDir, n), false))
        if (live.forall(n => n == token || tsOf(n) > myTs)) None
        else Some(lose())
      }

      election() match { case Some(r) => return r case None => }
      // preliminary winner: settle past the worst clock skew, then the
      // re-list catches any slower-clock proposal that arrived with a
      // smaller timestamp after the first list
      settle()
      election() match { case Some(r) => return r case None => }
      if (f.exists(target)) return lose()
      val ok = f.rename(tmp, target)
      f.delete(prop, false)
      try if (f.listStatus(propDir).isEmpty) f.delete(propDir, false)
      catch { case _: java.io.IOException => () }
      ok
    }
  }

  object LeasePut {
    /** Shared default (60 s lease, 2 s skew-settle) — the
      * out-of-the-box registration for object-store schemes.
      */
    val Default = new LeasePut()
  }

  // object-store schemes default to the lease election: SAFE for
  // multi-writer out of the box (exists+rename was not), upgradeable
  // to the store SDK's conditional put via register()
  @volatile private var registry: Map[String, CommitPrimitive] =
    Map("file" -> HardLink) ++
      Seq("s3a", "s3", "s3n", "gs", "abfs", "abfss", "oss", "wasb", "wasbs")
        .map(_ -> LeasePut.Default)

  /** Register the commit primitive for a URI scheme (e.g. `"s3a"` →
    * a [[ConditionalPut]] over the store SDK). Replaces any previous
    * registration; affects every subsequent commit in the JVM.
    */
  def register(scheme: String, p: CommitPrimitive): Unit =
    synchronized { registry += scheme -> p }

  def forScheme(scheme: String): CommitPrimitive =
    registry.getOrElse(scheme, RenameNoReplace)
}

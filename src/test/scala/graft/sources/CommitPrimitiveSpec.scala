package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

/** The exclusive-publish primitive on a REPLACE-on-rename store (the
  * object-store semantics `file://`'s hard link and HDFS's no-replace
  * rename both dodge): exists+rename has a TOCTOU window in which two
  * racers both "win" and one committed manifest silently vanishes.
  * The fake store makes that interleaving DETERMINISTIC — `exists`
  * answers "absent" to both racers, the way a real race does — so the
  * spec can pin both halves: the raw pair LOSES a commit, and a
  * registered conditional-put primitive REFUSES the same interleaving.
  */
class CommitPrimitiveSpec extends AnyFunSuite {

  /** Replace-on-rename filesystem whose `exists(target)` lies "absent"
    * the first `lies` times — the two sides of a TOCTOU race observing
    * the pre-publish state, compressed into one deterministic schedule.
    */
  private class ReplacingRenameFs(contended: String, lies: Int)
      extends RawLocalFileSystem {
    initialize(java.net.URI.create("file:///"), new Configuration())
    private var left = lies
    override def getScheme: String = "fakeobj"
    override def exists(p: Path): Boolean =
      if (p.getName == contended && left > 0) { left -= 1; false }
      else super.exists(p)
  }

  private def tmpDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("commitprim")

  private def stage(f: FileSystem, dir: java.nio.file.Path, name: String,
                    body: String): Path = {
    val p = new Path(dir.resolve(name).toString)
    val out = f.create(p, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    p
  }

  private def readAll(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  test("exists+rename on a replace-on-rename store LOSES a commit under " +
    "the raced interleaving — the hole the pluggable primitive closes") {
    val dir = tmpDir()
    val f = new ReplacingRenameFs("v1.json", lies = 2)
    val target = new Path(dir.resolve("v1.json").toString)
    val tmpA = stage(f, dir, "v1.json.tmp.a", "manifest-A")
    val tmpB = stage(f, dir, "v1.json.tmp.b", "manifest-B")
    // both racers pass the exists check (the lie = the race window),
    // both renames "succeed" — B replaces A's committed manifest
    assert(CommitPrimitive.RenameNoReplace.publish(f, tmpA, target))
    assert(CommitPrimitive.RenameNoReplace.publish(f, tmpB, target),
      "replace-on-rename lets the second racer 'win' too")
    assert(readAll(f, target) === "manifest-B",
      "A's commit was silently replaced — the lost-commit hole is real")
  }

  test("a registered conditional-put primitive REFUSES the same " +
    "interleaving; publishExclusive dispatches to it by scheme") {
    val dir = tmpDir()
    val f = new ReplacingRenameFs("v1.json", lies = 2)
    val target = new Path(dir.resolve("v1.json").toString)
    val tmpA = stage(f, dir, "v1.json.tmp.a", "manifest-A")
    val tmpB = stage(f, dir, "v1.json.tmp.b", "manifest-B")
    // test stand-in for the store SDK's conditional write (S3
    // If-None-Match:*, GCS ifGenerationMatch=0): an atomic
    // claim-then-write — the claim is the store's atomicity, not the
    // lying exists()
    val claims = new ConcurrentHashMap[String, Boolean]()
    CommitPrimitive.register("fakeobj",
      new CommitPrimitive.ConditionalPut((fs, t, bytes) =>
        if (claims.putIfAbsent(t.toString, true) != null) false
        else {
          val out = fs.create(t, true)
          try out.write(bytes) finally out.close()
          true
        }))
    assert(SnapshotTable.publishExclusive(f, tmpA, target),
      "first writer owns the version")
    assert(!SnapshotTable.publishExclusive(f, tmpB, target),
      "second writer must LOSE, loudly — never replace")
    assert(readAll(f, target) === "manifest-A",
      "the committed manifest survives the race")
    assert(f.exists(new Path(dir.resolve("v1.json.tmp.b").toString)),
      "loser's tmp is left for the caller's cleanup path")
  }

  test("default dispatch is unchanged: file → hard link, everything " +
    "unregistered → exists+rename (correct on HDFS's no-replace rename)") {
    assert(CommitPrimitive.forScheme("file") eq CommitPrimitive.HardLink)
    assert(CommitPrimitive.forScheme("hdfs") eq CommitPrimitive.RenameNoReplace)
    assert(CommitPrimitive.forScheme("s3a") eq CommitPrimitive.RenameNoReplace)
    // and the local hard-link path still publishes exactly once
    val dir = tmpDir()
    val f = FileSystem.getLocal(new Configuration())
    val target = new Path(dir.resolve("v7.json").toString)
    val tmpA = stage(f, dir, "v7.json.tmp.a", "A")
    val tmpB = stage(f, dir, "v7.json.tmp.b", "B")
    assert(SnapshotTable.publishExclusive(f, tmpA, target))
    assert(!SnapshotTable.publishExclusive(f, tmpB, target))
    assert(readAll(f, target) === "A")
  }
}

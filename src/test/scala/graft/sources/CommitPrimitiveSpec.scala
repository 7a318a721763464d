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

  test("default dispatch: file → hard link, hdfs → exists+rename " +
    "(no-replace rename is its contract), object-store schemes → the " +
    "lease election (multi-writer safe without SDK glue)") {
    assert(CommitPrimitive.forScheme("file") eq CommitPrimitive.HardLink)
    assert(CommitPrimitive.forScheme("hdfs") eq CommitPrimitive.RenameNoReplace)
    Seq("s3a", "gs", "abfs", "abfss").foreach { s =>
      assert(CommitPrimitive.forScheme(s) eq CommitPrimitive.LeasePut.Default,
        s"scheme $s must default to the lease election")
    }
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

  test("LeasePut settles the mid-flight race the lying exists() models: " +
    "a racer arriving while an earlier proposal is live LOSES the " +
    "election before the lying exists can matter") {
    val dir = tmpDir()
    // exists() lies 'absent' twice - the same race window that loses a
    // commit under exists+rename; here it cannot, because B's loss
    // comes from the ELECTION, which only needs consistent listing
    val f = new ReplacingRenameFs("v1.json", lies = 2)
    val target = new Path(dir.resolve("v1.json").toString)
    // writer A is mid-publish: proposal written, rename not yet issued
    val propDir = new Path(target.getParent, ".props-v1.json")
    f.mkdirs(propDir)
    val aTs = System.currentTimeMillis() - 10L
    val aProp = new Path(propDir, f"$aTs%020d.writer-a")
    f.create(aProp, false).close()
    val tmpB = stage(f, dir, "v1.json.tmp.b", "manifest-B")
    val p = new CommitPrimitive.LeasePut(settleMs = 50L)
    assert(!p.publish(f, tmpB, target),
      "B must lose the election to A's live earlier proposal")
    assert(!f.exists(new Path(dir.resolve("v1.json").toString))
      || readAll(f, target) != "manifest-B",
      "B must not have published")
    // A completes its half: with the race settled, its publish wins
    f.delete(aProp, false)
    val tmpA = stage(f, dir, "v1.json.tmp.a", "manifest-A")
    assert(p.publish(f, tmpA, target), "A completes the interrupted commit")
    assert(readAll(f, target) === "manifest-A")
  }

  test("LeasePut under the 8-writer hammer: exactly one publish wins, " +
    "the committed bytes are the winner's, and no proposal litter " +
    "survives") {
    val dir = tmpDir()
    val f = FileSystem.getLocal(new Configuration()).getRawFileSystem
    val target = new Path(dir.resolve("v9.json").toString)
    val p = new CommitPrimitive.LeasePut(settleMs = 50L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = (0 until 8).map { i =>
      val tmp = stage(f, dir, s"v9.json.tmp.$i", s"manifest-$i")
      pool.submit(new java.util.concurrent.Callable[(Int, Boolean)] {
        def call(): (Int, Boolean) = { gate.await(); (i, p.publish(f, tmp, target)) }
      })
    }
    gate.countDown()
    val outcome = results.map(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    val winners = outcome.filter(_._2)
    // an all-lose election round is livelock-safe but this schedule
    // (8 same-instant writers on one clock) must elect at most one
    assert(winners.size <= 1, s"two winners: $outcome")
    // the commit layer retries losers at the next version; here we
    // just need SOME round to have settled the target exclusively
    if (winners.size == 1) {
      assert(readAll(f, target) === s"manifest-${winners.head._1}",
        "the committed bytes must be exactly the winner's")
    }
    val propDir = new Path(target.getParent, ".props-v9.json")
    assert(!f.exists(propDir) || f.listStatus(propDir).isEmpty,
      "losers and the winner must clean their proposals")
  }

  test("clock skew: from the paused both-elected configuration, the " +
    "one-shot election (the pre-settle algorithm) double-commits, and " +
    "LeasePut's settle + re-list elects exactly the slower clock's " +
    "smaller-timestamp proposal") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val f = FileSystem.getLocal(new Configuration()).getRawFileSystem

    // the dangerous configuration, built deterministically: writer A's
    // clock runs 10 s FAST; A proposes and elects FIRST (sees only
    // itself); B (true clock) proposes a SMALLER timestamp afterwards
    // and also elects (A's visible stamp is larger). Both now sit
    // between election and rename — the double-commit window skew
    // opens in a one-shot election.
    def oldOneShotElect(dir: java.nio.file.Path, target: Path, ts: Long,
                        who: String): Boolean = {
      // the pre-settle algorithm's election, replicated as a seam so
      // the rename can be issued from the paused configuration
      val propDir = new Path(target.getParent, s".props-${target.getName}")
      f.mkdirs(propDir)
      f.create(new Path(propDir, f"$ts%020d.$who"), false).close()
      f.listStatus(propDir).map(_.getPath.getName)
        .forall(n => n == f"$ts%020d.$who" || n.takeWhile(_ != '.').toLong > ts)
    }
    val dir1 = tmpDir()
    val t1 = new Path(dir1.resolve("v8.json").toString)
    val base = System.currentTimeMillis()
    val aWon1 = oldOneShotElect(dir1, t1, base + 10000L, "writer-a")
    val bWon1 = oldOneShotElect(dir1, t1, base, "writer-b")
    assert(aWon1 && bWon1,
      "one-shot election: BOTH writers elect under skew — the bug")
    // both now rename; replace-on-rename → the second silently wins
    assert(f.rename(stage(f, dir1, "v8.tmp.b", "B"), t1))
    assert(f.rename(stage(f, dir1, "v8.tmp.a", "A"), t1))
    assert(readAll(f, t1) === "A", "B's commit was silently lost")

    // the FIX: same configuration driven through the real primitive —
    // both writers pause at their settle point (post-election,
    // pre-rename), then resume: each re-list sees the other's live
    // proposal and only the smaller timestamp survives
    val dir2 = tmpDir()
    val t2 = new Path(dir2.resolve("v9.json").toString)
    val atSettleA = new CountDownLatch(1)
    val atSettleB = new CountDownLatch(1)
    val resume = new CountDownLatch(1)
    def skewed(skewMs: Long, at: CountDownLatch) =
      new CommitPrimitive.LeasePut(60000L, 0L) {
        override protected def now(): Long =
          System.currentTimeMillis() + skewMs
        override protected def settle(): Unit = { at.countDown(); resume.await() }
      }
    val writerA = skewed(10000L, atSettleA)
    val writerB = skewed(0L, atSettleB)
    val tmpA = stage(f, dir2, "v9.tmp.a", "A")
    val tmpB = stage(f, dir2, "v9.tmp.b", "B")
    val pool = Executors.newFixedThreadPool(2)
    val aFut = pool.submit(new java.util.concurrent.Callable[Boolean] {
      def call(): Boolean = writerA.publish(f, tmpA, t2) })
    atSettleA.await(10, TimeUnit.SECONDS)
    val bFut = pool.submit(new java.util.concurrent.Callable[Boolean] {
      def call(): Boolean = writerB.publish(f, tmpB, t2) })
    assert(atSettleB.await(10, TimeUnit.SECONDS),
      "B must also elect preliminarily (its stamp is the smaller)")
    resume.countDown()
    val aWon2 = aFut.get(30, TimeUnit.SECONDS)
    val bWon2 = bFut.get(30, TimeUnit.SECONDS)
    pool.shutdown()
    assert(!aWon2 && bWon2,
      s"settle + re-list must elect exactly the smaller stamp (a=$aWon2 b=$bWon2)")
    assert(readAll(f, t2) === "B")
  }

  test("LeasePut reaps a dead winner's stale proposal after the lease " +
    "and the next writer proceeds; a LIVE proposal still blocks") {
    val dir = tmpDir()
    val f = FileSystem.getLocal(new Configuration()).getRawFileSystem
    val target = new Path(dir.resolve("v3.json").toString)
    val propDir = new Path(target.getParent, ".props-v3.json")
    f.mkdirs(propDir)
    // a crashed writer's proposal: timestamp far in the past
    val deadTs = System.currentTimeMillis() - 3600000L
    val dead = new Path(propDir, f"$deadTs%020d.dead-writer-uuid")
    f.create(dead, false).close()
    val tmpA = stage(f, dir, "v3.json.tmp.a", "A")
    val shortLease = new CommitPrimitive.LeasePut(leaseMs = 1000L, settleMs = 50L)
    assert(shortLease.publish(f, tmpA, target),
      "an hour-old proposal with no published target is a dead winner")
    assert(readAll(f, target) === "A")
    assert(!f.exists(dead), "the dead proposal must be reaped")
    // live proposal with an EARLIER timestamp blocks a new writer
    val target2 = new Path(dir.resolve("v4.json").toString)
    val propDir2 = new Path(target2.getParent, ".props-v4.json")
    f.mkdirs(propDir2)
    val liveTs = System.currentTimeMillis() - 100L
    f.create(new Path(propDir2, f"$liveTs%020d.live-writer-uuid"), false)
      .close()
    val tmpB = stage(f, dir, "v4.json.tmp.b", "B")
    assert(!shortLease.publish(f, tmpB, target2),
      "an in-lease earlier proposal must win the election")
    assert(!f.exists(target2))
  }
}

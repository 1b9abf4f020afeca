package graft

import java.nio.file.{Files, Paths}

import graft.sources.{FreezeLease, FreezeStore}
import org.apache.spark.sql.functions._

/** The cross-process commit lease (VERDICT r11 #4): two writers on
  * one warehouse must never interleave a pointer flip, and a second
  * process must never "heal" a LIVE writer's in-flight two-rename
  * window backward. The lease file is the cross-process primitive, so
  * a foreign process is faithfully simulated by acquiring the same
  * family's lease file directly through [[FreezeLease]] with a
  * different holder id — create-exclusive semantics are per-FILE, not
  * per-JVM, so the contention path exercised here is byte-identical
  * to what a second driver would hit. */
class FreezeLeaseSpec extends SparkSpec {

  // unique per run (ADVICE r12): a crashed prior run's fresh-mtime
  // lease file in a FIXED directory would make the first acquire
  // fail for up to staleMs — a flaky-rerun hazard, not a product bug
  private val dir = Files.createTempDirectory("graft_lease_spec")

  test("lease: exclusive while held, reacquirable after release") {
    val a = FreezeLease.tryAcquire(dir, "famA", "holder-a", staleMs = 60000)
    assert(a.isDefined, "first acquire must win")
    assert(FreezeLease.tryAcquire(dir, "famA", "holder-b", 60000).isEmpty,
      "a live lease must block a second holder")
    assert(FreezeLease.currentHolder(dir, "famA").contains("holder-a"))
    // an unrelated family is unaffected
    val other = FreezeLease.tryAcquire(dir, "famB", "holder-b", 60000)
    assert(other.isDefined)
    other.get.release()
    a.get.release()
    val b = FreezeLease.tryAcquire(dir, "famA", "holder-b", 60000)
    assert(b.isDefined, "release must free the family")
    b.get.release()
  }

  test("lease: a dead holder's file stales out and is broken exactly once") {
    val a = FreezeLease.tryAcquire(dir, "famC", "dead-holder", 60000).get
    // simulate death: no release, heartbeat long past
    Files.setLastModifiedTime(a.path,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000))
    val b = FreezeLease.tryAcquire(dir, "famC", "breaker", staleMs = 60000)
    assert(b.isDefined, "a stale lease must be breakable")
    assert(FreezeLease.currentHolder(dir, "famC").contains("breaker"))
    b.get.release()
  }

  test("lease: heartbeat keeps a slow-but-live holder unbroken") {
    val a = FreezeLease.tryAcquire(dir, "famD", "slow-holder", 60000).get
    // age the file, then heartbeat — the renewal must defeat staleness
    Files.setLastModifiedTime(a.path,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000))
    a.heartbeat()
    assert(FreezeLease.tryAcquire(dir, "famD", "impatient", staleMs = 60000).isEmpty,
      "a heartbeated lease must not be broken")
    a.release()
  }

  test("ownership: a broken holder's release must NOT delete the new holder's lease") {
    val a = FreezeLease.tryAcquire(dir, "famO", "stalled-holder", 60000).get
    // the holder stalls past staleMs (no heartbeat) and is broken
    Files.setLastModifiedTime(a.path,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000))
    val b = FreezeLease.tryAcquire(dir, "famO", "new-holder", staleMs = 60000).get
    // the stalled holder resumes and releases: ADVICE r12 — the old
    // unchecked delete here removed the NEW holder's file, reopening
    // the exact cross-process window the lease exists to close
    a.release()
    assert(FreezeLease.currentHolder(dir, "famO").contains("new-holder"),
      "release of a broken lease must leave the new holder's file intact")
    // and the new holder still operates normally
    b.heartbeat()
    b.release()
    assert(FreezeLease.currentHolder(dir, "famO").isEmpty)
  }

  test("ownership: a broken holder's heartbeat/checkOwned throws LOUDLY") {
    val a = FreezeLease.tryAcquire(dir, "famP", "stalled-holder", 60000).get
    Files.setLastModifiedTime(a.path,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000))
    val b = FreezeLease.tryAcquire(dir, "famP", "breaker", staleMs = 60000).get
    // the stalled holder's next commit-point check must abort it —
    // never proceed concurrently with the breaker's commit
    intercept[IllegalStateException] { a.heartbeat() }
    intercept[IllegalStateException] { a.checkOwned() }
    b.release()
  }

  test("lease: acquire fails LOUDLY at the deadline, naming the holder") {
    val a = FreezeLease.tryAcquire(dir, "famE", "the-culprit", 60000).get
    val e = intercept[IllegalStateException] {
      FreezeLease.acquire(dir, "famE", "blocked", staleMs = 60000, waitMs = 100)
    }
    assert(e.getMessage.contains("the-culprit"),
      s"the error must name the live holder: ${e.getMessage}")
    assert(e.getMessage.contains("famE"))
    a.release()
  }

  test("flip blocks behind a foreign lease; crash-heal never runs under it") {
    import spark.implicits._
    val name = "lease_spec_fam"
    FreezeStore.dropAll(spark, name)
    spark.conf.set("spark.graft.lease.waitMs", "300")
    try {
      // a healthy commit first
      FreezeStore.flipPtr(spark, name, gen = 1L, batches = Seq(0L))
      assert(FreezeStore.readPtr(spark, name).contains((1L, Seq(0L))))

      // simulate a FOREIGN writer crashed (or paused) mid-flip: the
      // live pointer renamed away, the lease still held by the other
      // process — exactly the two-rename window
      spark.sql(s"ALTER TABLE ${name}_ptr RENAME TO ${name}_ptr_old")
      val wh = Paths.get(new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath)
      val foreign = FreezeLease.tryAcquire(wh, name, "pid99999@elsewhere", 600000).get

      // a reader that would heal must block on the lease and fail
      // LOUDLY at the deadline — and must NOT have healed backward
      val e = intercept[IllegalStateException] {
        FreezeStore.readPtr(spark, name)
      }
      assert(e.getMessage.contains("pid99999@elsewhere"))
      assert(!spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(s"${name}_ptr")),
        "the blocked reader must not have renamed ptr_old back")

      // a writer's flip is blocked the same way
      val e2 = intercept[IllegalStateException] {
        FreezeStore.flipPtr(spark, name, gen = 2L, batches = Seq(0L))
      }
      assert(e2.getMessage.contains("commit lease"))

      // foreign writer finishes (releases): the next read heals the
      // crashed flip and the family answers again
      foreign.release()
      assert(FreezeStore.readPtr(spark, name).contains((1L, Seq(0L))),
        "after the lease clears, recovery restores the old pointer")
    } finally {
      spark.conf.unset("spark.graft.lease.waitMs")
      FreezeStore.dropAll(spark, name)
    }
  }

  test("flip under lease end-to-end: lease file is gone after a commit") {
    val name = "lease_spec_fam2"
    FreezeStore.dropAll(spark, name)
    FreezeStore.flipPtr(spark, name, gen = 1L, batches = Seq(0L))
    val wh = Paths.get(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)
    assert(!Files.exists(wh.resolve(s"graft_$name.lease")),
      "a completed flip must release its lease")
    FreezeStore.dropAll(spark, name)
  }
}

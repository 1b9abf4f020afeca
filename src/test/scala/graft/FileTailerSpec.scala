package graft

import graft.streaming.FileTailer
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic (no-thread) tests of the single-file follow logic:
  * each case drives `poll()` by hand and reads the spool directly. */
class FileTailerSpec extends AnyFunSuite {

  private def setup() = {
    val dir = Files.createTempDirectory("tail").toString
    (s"$dir/maillog", s"$dir/spool")
  }

  private def append(path: String, s: String): Unit =
    Files.write(Paths.get(path), s.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  private def spooled(spool: String): String = {
    val d = Paths.get(spool)
    if (!Files.exists(d)) ""
    else {
      import scala.jdk.CollectionConverters._
      Files.list(d).iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".log")).sortBy(_.getFileName.toString)
        .map(p => new String(Files.readAllBytes(p), "UTF-8")).mkString
    }
  }

  test("emits only completed lines; appended data flows on later polls") {
    val (file, spool) = setup()
    append(file, "line one\nline two\npartial")
    val t = new FileTailer(file, spool)
    t.poll()
    assert(spooled(spool) === "line one\nline two\n",
      "the unterminated tail line is withheld")
    t.poll()
    assert(spooled(spool) === "line one\nline two\n", "no growth, no emission")
    append(file, " completed\nline three\n")
    t.poll()
    assert(spooled(spool) ===
      "line one\nline two\npartial completed\nline three\n")
    t.close()
  }

  test("restart resumes at the stored offset without re-emitting") {
    val (file, spool) = setup()
    append(file, "a\nb\n")
    val t1 = new FileTailer(file, spool)
    t1.poll(); t1.close()
    assert(spooled(spool) === "a\nb\n")
    append(file, "c\n")
    val t2 = new FileTailer(file, spool)
    t2.poll(); t2.close()
    assert(spooled(spool) === "a\nb\nc\n", "only the new line after restart")
  }

  test("rotation: old inode drained (even unterminated), new file followed") {
    val (file, spool) = setup()
    append(file, "old1\nold2 no newline")
    val t = new FileTailer(file, spool)
    t.poll()
    assert(spooled(spool) === "old1\n")
    // rotate: move the file away and create a fresh one at the path
    Files.move(Paths.get(file), Paths.get(file + ".1"),
      StandardCopyOption.ATOMIC_MOVE)
    append(file, "new1\n")
    t.poll()
    assert(spooled(spool) === "old1\nold2 no newline\nnew1\n",
      "rotation drains the old file's last partial line, then re-opens")
    append(file, "new2\n")
    t.poll()
    assert(spooled(spool) === "old1\nold2 no newline\nnew1\nnew2\n")
    t.close()
  }

  test("in-place truncation (copytruncate) restarts from offset zero") {
    val (file, spool) = setup()
    append(file, "aaa\nbbb\n")
    val t = new FileTailer(file, spool)
    t.poll()
    Files.write(Paths.get(file), "x\n".getBytes("UTF-8"),
      StandardOpenOption.TRUNCATE_EXISTING)
    t.poll()
    assert(spooled(spool) === "aaa\nbbb\nx\n")
    t.close()
  }

  test("stale persisted seq cannot overwrite an already-published spool file") {
    val (file, spool) = setup()
    append(file, "a\n")
    val t1 = new FileTailer(file, spool)
    t1.poll(); t1.close()
    // simulate a crash between emit() and saveState(): spool file 1
    // exists but the state file still carries the previous seq
    val st = Paths.get(spool, ".tail-state")
    val Array(ino, off, _) =
      new String(Files.readAllBytes(st), "UTF-8").trim.split("\t")
    Files.write(st, s"$ino\t$off\t0\n".getBytes("UTF-8"))
    append(file, "b\n")
    val t2 = new FileTailer(file, spool)
    t2.poll(); t2.close()
    assert(spooled(spool) === "a\nb\n",
      "the published spool file must stay intact; new data goes to a NEW file")
  }

  test("file created after the tailer starts is picked up") {
    val (file, spool) = setup()
    val t = new FileTailer(file, spool)
    t.poll() // nothing there yet
    assert(spooled(spool) === "")
    append(file, "late\n")
    t.poll()
    assert(spooled(spool) === "late\n")
    t.close()
  }

  test("a backlog larger than one chunk drains in bounded pieces, lossless") {
    val (file, spool) = setup()
    // ~36 MiB of lines: > 2 chunks, so one poll must loop, never
    // allocating the whole backlog at once
    val line = ("x" * 127) + "\n"
    val block = line * 8192 // 1 MiB
    (1 to 36).foreach(_ => append(file, block))
    append(file, "tail-partial")
    val t = new FileTailer(file, spool)
    t.poll()
    val out = spooled(spool)
    assert(out.length === 36 * block.length, "all complete lines in one poll")
    assert(!out.contains("tail-partial"))
    import scala.jdk.CollectionConverters._
    val nFiles = Files.list(Paths.get(spool)).iterator().asScala
      .count(_.getFileName.toString.endsWith(".log"))
    assert(nFiles >= 3, "backlog must be emitted as multiple bounded chunks")
    t.close()
  }

  test("spool sweep deletes files past retention, keeps recent ones") {
    val (file, spool) = setup()
    append(file, "old\n")
    val t = new FileTailer(file, spool, retentionMs = 60000L)
    t.sweepIntervalMs = 0L // test hook: sweep on every poll
    t.poll()
    assert(spooled(spool) === "old\n")
    // age the published spool file past retention, then poll again
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(spool)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".log"))
      .foreach(p => Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 120000L)))
    append(file, "new\n")
    t.poll()
    assert(spooled(spool) === "new\n",
      "aged file swept, fresh file kept, state file untouched")
    t.close()
  }
}

package graft.streaming

import java.io.RandomAccessFile
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** `tail -F` for Structured Streaming: follow ONE growing file — the
  * reference's primary deployment shape (`-maillog /var/log/maillog`,
  * maillog2db.go:168, `tail.Config{Follow: true, ReOpen: true}`) —
  * which Spark's file source cannot do (it only ever sees NEW files,
  * never appends to an existing one).
  *
  * Design: rather than a custom DataSource, the tailer bridges the
  * append-only file into the file source's contract. It tracks a byte
  * offset into the followed file and, on each poll, moves every newly
  * completed line into a fresh spool file (atomic tmp+rename, so the
  * stream never lists a half-written file); `readStream.text(spool)`
  * then drives the unchanged pipeline with full checkpoint/replay
  * semantics. Tailing one file is inherently a single-reader job (the
  * reference has the same property); the parallelism lives downstream.
  *
  * Rotation (`ReOpen`): the file handle is kept open, so when the
  * path is re-created with a new inode the old handle is drained to
  * EOF first — including a final unterminated line — then the new
  * file is followed from offset 0. In-place truncation
  * (copytruncate-style rotation) resets the offset. Re-opens re-stat
  * the path after opening and retry if the inode changed in between,
  * so a rotation racing the open cannot pair the new handle with the
  * old inode's key (which would re-emit the whole file next poll).
  *
  * Restart: `(fileKey, offset, seq)` is persisted to a state file in
  * the spool dir after every emit (tmp+rename). A restarted tailer on
  * the same inode resumes at the stored offset, so spooled-and-
  * checkpointed lines are not re-emitted.
  *
  * Memory: reads are chunked at [[FileTailer.MaxChunk]] — first start
  * against a multi-GB existing log drains it in bounded buffers
  * instead of one giant allocation. A single LINE larger than a chunk
  * (broken input for a line protocol) is force-split with a warning
  * rather than livelocking. The split is silent IN THE DATA: each
  * MaxChunk fragment is emitted as its own record with no marker
  * (adding one would alter byte-exact passthrough for consumers that
  * reassemble); detect fragmentation by record length == MaxChunk,
  * or watch for the rate-limited "split" warning category.
  *
  * Disk: spool files duplicate the tailed data, so each poll sweeps
  * spool files older than `retentionMs` (default 24 h). The retention
  * must exceed the longest stop-the-daemon-then-restart gap you want
  * replayable; the streaming checkpoint is normally seconds behind.
  *
  * Partial lines are never emitted while the file may still grow:
  * the offset only advances past the last `\n` seen.
  */
class FileTailer(path: String, spoolDir: String, pollMs: Long = 500L,
                 retentionMs: Long = 24L * 3600 * 1000)
    extends AutoCloseable {

  import FileTailer.MaxChunk

  private val spool: Path = Paths.get(spoolDir)
  Files.createDirectories(spool)
  private val stateFile: Path = spool.resolve(".tail-state")

  private var handle: Option[RandomAccessFile] = None
  private var handleKey: String = ""
  private var offset: Long = 0L
  private var seq: Long = 0L
  private var lastSweepMs: Long = 0L
  private[graft] var sweepIntervalMs: Long = 60000L // test hook
  // per-CATEGORY warn clocks: a once-a-minute global limit let an
  // earlier unrelated warning swallow a line-split event entirely
  private val lastWarnMs = scala.collection.mutable.Map.empty[String, Long]
  private val suppressed = scala.collection.mutable.Map.empty[String, Long]
  @volatile private var closed = false
  private var thread: Option[Thread] = None

  loadState()

  private def fileKey(p: Path): Option[String] =
    try Some(String.valueOf(
      Files.readAttributes(p, classOf[java.nio.file.attribute.BasicFileAttributes])
        .fileKey()))
    catch { case _: java.io.IOException => None }

  /** Rate-limited (1/min PER CATEGORY) stderr diagnostics: a
    * permanently unreadable file must not look identical to an idle
    * one, and a rare event (line split) must never be masked by an
    * earlier unrelated warning inside the same minute. Suppressed
    * repeats are counted and reported with the next emit. */
  private def warn(cat: String, msg: String): Unit = {
    val now = System.currentTimeMillis()
    if (now - lastWarnMs.getOrElse(cat, 0L) >= 60000L) {
      lastWarnMs(cat) = now
      val extra = suppressed.getOrElse(cat, 0L)
      suppressed(cat) = 0L
      val tail = if (extra > 0) s" (+$extra suppressed)" else ""
      System.err.println(s"[graft-tailer $path] $msg$tail")
    } else suppressed(cat) = suppressed.getOrElse(cat, 0L) + 1
  }

  private def loadState(): Unit = {
    if (Files.exists(stateFile)) {
      val parts = new String(Files.readAllBytes(stateFile), "UTF-8").trim.split("\t")
      if (parts.length == 3) {
        seq = parts(2).toLong
        // resume the offset only if the followed file is still the
        // same inode; a rotated/replaced file restarts at 0
        if (fileKey(Paths.get(path)).contains(parts(0))) {
          handleKey = parts(0)
          offset = parts(1).toLong
        }
      }
    }
    // a crash between emit() and saveState() leaves a spool file the
    // stream may already have consumed but a stale persisted seq —
    // reusing that name would atomically REPLACE a processed file the
    // source never re-reads (silent data loss). Recover the true max
    // from the spool listing.
    import scala.jdk.CollectionConverters._
    val listing = Files.list(spool) // must close: holds a directory fd
    val onDisk =
      try listing.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.endsWith(".log") => n.stripSuffix(".log").toLong }
        .maxOption.getOrElse(0L)
      finally listing.close()
    seq = math.max(seq, onDisk)
  }

  private def saveState(): Unit = {
    val tmp = spool.resolve(".tail-state.tmp")
    Files.write(tmp, s"$handleKey\t$offset\t$seq\n".getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, stateFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Atomically publish one spool file with the given bytes. */
  private def emit(bytes: Array[Byte]): Unit = {
    seq += 1
    val tmp = spool.resolve(f".tmp-$seq%012d")
    Files.write(tmp, bytes, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, spool.resolve(f"$seq%012d.log"),
      StandardCopyOption.ATOMIC_MOVE)
    saveState()
  }

  /** Delete spool files past retention (their data is long since
    * checkpointed); the state file is never touched. Swept at most
    * once a minute. */
  private def sweepSpool(): Unit = {
    val now = System.currentTimeMillis()
    if (now - lastSweepMs < sweepIntervalMs) return
    lastSweepMs = now
    import scala.jdk.CollectionConverters._
    val listing = Files.list(spool)
    try listing.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".log"))
      .foreach { p =>
        try {
          if (now - Files.getLastModifiedTime(p).toMillis > retentionMs)
            Files.deleteIfExists(p)
        } catch { case _: java.io.IOException => () }
      }
    finally listing.close()
  }

  /** Read [offset, length-at-entry) from the handle in bounded
    * chunks; emit up to the last complete line of each chunk (or
    * everything when `drainAll`, for a rotated-away file that will
    * never grow again). */
  private def readNew(raf: RandomAccessFile, drainAll: Boolean): Unit = {
    val len = raf.length()
    if (len < offset) offset = 0L // truncated in place (copytruncate)
    var more = true
    while (more && len > offset) {
      val n = math.min(len - offset, MaxChunk.toLong).toInt
      val buf = new Array[Byte](n)
      raf.seek(offset)
      raf.readFully(buf)
      val atEof = offset + n >= len
      var cut =
        if (drainAll && atEof) n
        else {
          var i = n - 1
          while (i >= 0 && buf(i) != '\n') i -= 1
          i + 1 // 0 when no newline yet: withhold the partial line
        }
      if (cut == 0 && n == MaxChunk) {
        // a single line larger than the chunk: force-split rather
        // than buffering without bound or spinning forever
        warn("split", s"line exceeds $MaxChunk bytes; splitting")
        cut = n
      }
      if (cut > 0) {
        val out =
          if (drainAll && atEof && buf(cut - 1) != '\n')
            buf.take(cut) ++ Array[Byte]('\n')
          else buf.take(cut)
        offset += cut
        emit(out)
        if (cut < n) more = false // stopped at a partial line
      } else more = false
    }
  }

  /** Open the path and verify it still names the inode we statted —
    * a rotation racing the open would otherwise pair the NEW file's
    * handle with the OLD inode's key, and the next poll would
    * misdiagnose a rotation and re-read the file from 0. */
  private def openVerified(p: Path): Unit = {
    var tries = 0
    while (handle.isEmpty && tries < 3) {
      tries += 1
      fileKey(p) match {
        case None => return // vanished; next poll retries
        case Some(k) =>
          val raf = new RandomAccessFile(path, "r")
          if (fileKey(p).contains(k)) {
            if (k != handleKey) { handleKey = k; offset = 0L }
            handle = Some(raf)
          } else raf.close() // rotated mid-open; retry
      }
    }
  }

  /** One follow step. Synchronized so an explicit test-driven poll
    * and the background thread never interleave. */
  def poll(): Unit = synchronized {
    val p = Paths.get(path)
    (handle, fileKey(p)) match {
      case (None, Some(_)) => // first sight of the file
        openVerified(p)
        handle.foreach(readNew(_, drainAll = false))
      case (Some(raf), cur) if cur.exists(_ != handleKey) || cur.isEmpty =>
        // rotated: drain the old inode fully, then re-open (ReOpen)
        readNew(raf, drainAll = true)
        raf.close()
        handle = None
        offset = 0L
        if (cur.isDefined) {
          openVerified(p)
          handle.foreach(readNew(_, drainAll = false))
        }
      case (Some(raf), _) =>
        readNew(raf, drainAll = false)
      case (None, None) => () // file not created yet: keep waiting
    }
    sweepSpool()
  }

  /** Spawn the background follow thread (daemon: dies with the JVM). */
  def start(): FileTailer = {
    val t = new Thread(() => {
      while (!closed) {
        try poll()
        catch {
          case e: java.io.IOException =>
            warn("io", s"poll IO error (will retry): ${e.getMessage}")
          case _: InterruptedException => closed = true
          case e: Throwable =>
            // never let an unexpected error silently kill the tail
            // thread while the daemon's queries look healthy
            warn("poll", s"poll error (will retry): $e")
        }
        try Thread.sleep(pollMs)
        catch { case _: InterruptedException => closed = true }
      }
    }, s"graft-file-tailer-$path")
    t.setDaemon(true)
    t.start()
    thread = Some(t)
    this
  }

  override def close(): Unit = {
    closed = true
    thread.foreach(_.join(5000))
    synchronized { handle.foreach(_.close()); handle = None }
  }
}

object FileTailer {
  /** Per-read buffer bound: large backlogs drain in pieces instead of
    * one (len - offset)-sized allocation that OOMs on a first start
    * against a multi-GB log. */
  private[streaming] val MaxChunk: Int = 16 << 20
}

package graft.log

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Pluggable atomic commit publication — the seam that decides how a
  * staged commit JSON becomes visible as `vNNN.json` exactly once.
  *
  * The default [[AtomicRenameLogStore]] relies on an atomic
  * fail-if-exists primitive (hard link on POSIX, `FileContext.rename`
  * with `Rename.NONE` on HDFS-like stores). Object stores without
  * atomic rename (S3-class) need a different strategy — Delta ships
  * pluggable LogStores for exactly this reason, and the reference
  * sidesteps it by delegating isolation to lakeFS branches
  * (lakefs_io/deltalake_polars_lakefs_type_handler.py:87-159). Here the
  * strategy is selected per Hadoop conf (`graft.logstore.impl` = class
  * name), so an S3 deployment can plug a conditional-put
  * implementation without touching the commit protocol.
  *
  * Contract: after `publish` returns, `target` exists with exactly
  * `tmp`'s bytes and `tmp` is gone; if `target` already existed (a
  * concurrent committer won), `tmp` is cleaned up and
  * `java.util.ConcurrentModificationException` is thrown — the signal
  * the optimistic-retry loops ([[graft.io.GraftWriter]],
  * [[graft.manager.RetryingCoordinator]]) are built on. A silent
  * overwrite is the one forbidden outcome: it loses the winner's
  * commit.
  */
trait LogStore {
  def publish(
      fs: FileSystem,
      conf: Configuration,
      tmp: Path,
      target: Path,
      /** For error messages: "version N for <table>". */
      context: String): Unit
}

object LogStore {
  /** Hadoop conf key naming the [[LogStore]] implementation class (a
    * public zero-arg constructor); unset = [[AtomicRenameLogStore]].
    */
  val ConfKey = "graft.logstore.impl"

  def forConf(conf: Configuration): LogStore =
    Option(conf.get(ConfKey)).filter(_.nonEmpty) match {
      case None => AtomicRenameLogStore
      case Some(cls) =>
        java.lang.Class.forName(cls)
          .getDeclaredConstructor().newInstance().asInstanceOf[LogStore]
    }

  private[log] def loseRace(fs: FileSystem, tmp: Path, context: String): Nothing = {
    try fs.delete(tmp, false)
    catch { case scala.util.control.NonFatal(_) => () }
    throw new java.util.ConcurrentModificationException(
      s"concurrent commit at $context")
  }
}

/** Atomic fail-if-exists publication: hard-link on local POSIX
  * filesystems (atomic, EEXIST on collision — plain `rename(2)`
  * silently replaces, so an exists()+rename pair would have a
  * lost-commit race), `FileContext.rename(..., Rename.NONE)` (atomic
  * fail-if-exists) everywhere else.
  */
object AtomicRenameLogStore extends LogStore {
  override def publish(
      fs: FileSystem,
      conf: Configuration,
      tmp: Path,
      target: Path,
      context: String): Unit = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    try {
      if (scheme == "file") {
        val nioTmp = java.nio.file.Paths.get(tmp.toUri.getPath)
        val nioTarget = java.nio.file.Paths.get(target.toUri.getPath)
        java.nio.file.Files.createLink(nioTarget, nioTmp)
        fs.delete(tmp, false)
      } else {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
        fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.NONE)
      }
    } catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        LogStore.loseRace(fs, tmp, context)
    }
  }
}

/** Staged put-if-absent publication for stores WITHOUT atomic rename:
  * writes the staged bytes directly at `target` through
  * `create(overwrite = false)` and then READS THEM BACK.
  *
  * On HDFS/local, `create(false)` is an atomic exclusive create, so
  * this is fully safe (just slower than the rename store — one extra
  * round trip). On an object store, `create(false)` maps to the
  * store's conditional primitive where one exists (S3 If-None-Match
  * puts, GCS preconditions, Azure ETags); where the connector only
  * offers check-then-put, the read-back closes most of the race
  * window but cannot close it entirely — that residual is exactly why
  * Delta pairs S3 with an external coordination service, and why this
  * implementation is documented BEST-EFFORT: it never loses a commit
  * silently in the outcomes it can observe (either the exclusive
  * create fails, or the surviving bytes are not ours — both raise
  * ConcurrentModificationException), but a store that acknowledges two
  * blind overwrites in order can still fool it. Plug a store-native
  * conditional implementation for hard guarantees.
  *
  * Visibility caveat: object-store PUTs are atomic (the object appears
  * only when the put COMPLETES — a crash mid-put leaves nothing), but
  * on POSIX/HDFS a created file is visible while still being written:
  * a concurrent log reader can transiently see a partial commit, and a
  * CRASH between create and close leaves a permanent truncated
  * `vNNN.json` that wedges the version (readers fail parsing it; later
  * committers lose the exclusive create to it forever). That failure
  * mode is impossible under [[AtomicRenameLogStore]] (bytes land in a
  * temp file; the rename is all-or-nothing) — which is why the rename
  * store stays the default and the REQUIRED choice on filesystems
  * whose create streams into a visible file. This store is for stores
  * whose put visibility is atomic at close.
  */
class ConditionalPutLogStore extends LogStore {
  override def publish(
      fs: FileSystem,
      conf: Configuration,
      tmp: Path,
      target: Path,
      context: String): Unit = {
    val bytes = readAll(fs, tmp)
    val out =
      try createExclusive(fs, target)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.io.IOException if fs.exists(target) =>
          LogStore.loseRace(fs, tmp, context)
      }
    try out.write(bytes)
    finally out.close()
    beforeVerify(fs, target)
    // read-back verification: if a racer interleaved between our
    // exists-check and write on a non-atomic store, the surviving
    // content may be theirs — losing must be LOUD, never silent
    val survived =
      try readAll(fs, target)
      catch { case scala.util.control.NonFatal(_) => Array.empty[Byte] }
    if (!java.util.Arrays.equals(survived, bytes))
      LogStore.loseRace(fs, tmp, context)
    fs.delete(tmp, false)
  }

  /** The conditional-create primitive — overridable so fault-injection
    * tests can model a store whose create is NOT exclusive (a blind
    * put) and prove the read-back still refuses to lose silently.
    */
  protected def createExclusive(
      fs: FileSystem, target: Path): org.apache.hadoop.fs.FSDataOutputStream =
    fs.create(target, /* overwrite = */ false)

  /** Called between the put and the read-back — fault-injection hook
    * modeling a racer whose write lands after ours was acknowledged.
    */
  protected def beforeVerify(fs: FileSystem, target: Path): Unit = ()

  private def readAll(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }
}

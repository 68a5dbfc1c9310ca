package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The METADATA-PLANE storage primitive behind the tile-table commit
  * protocol: conditional put (the versioned-manifest publication),
  * immutable object writes (segments), reads, listing, deletion and
  * mtime (lock heartbeat / vacuum aging) — everything
  * `TileTable.commitManifest` / `withTableLock` / `vacuum` need, and
  * nothing more. Paths are RELATIVE to the table root.
  *
  * Two implementations ship:
  *   - [[LocalManifestStore]] — POSIX: the conditional put is
  *     stage-then-`Files.createLink` (link(2) EEXIST → atomic
  *     create-with-content, no check-then-move window);
  *   - [[InMemoryCasStore]] — a compare-and-swap object store double
  *     (the S3 `If-None-Match:*` / GCS `x-goog-if-generation-match:0`
  *     shape) with race-injection hooks, proving in tests that the
  *     whole mutation protocol (append/compact/vacuum/replay,
  *     including lost commit races) is correct against conditional-put
  *     semantics alone — no POSIX atomicity assumed.
  *
  * A real object-store backend implements this trait with the store's
  * conditional write and registers itself via
  * [[ManifestStore.register]] for its root; the DATA plane (Parquet
  * tile files, vacuum/compact's directory walk and GC) flows entirely
  * through the root's Hadoop filesystem and needs no port — nothing
  * in the table lifecycle touches java.nio outside this trait's
  * local implementation.
  */
trait ManifestStore {
  /** Atomic conditional put — create `rel` with `bytes` only if it
    * does not exist; false when it already does (the loser of a
    * commit race). MUST be atomic with respect to concurrent
    * putIfAbsent of the same name: exactly one caller wins. */
  def putIfAbsent(rel: String, bytes: Array[Byte]): Boolean

  /** Unconditional put. Callers only use it for IMMUTABLE objects
    * with unique names (segments, steal tombstones). */
  def put(rel: String, bytes: Array[Byte]): Unit

  /** Object bytes, or None if absent. */
  def read(rel: String): Option[Array[Byte]]

  /** Names (not paths) of objects directly under `dir` ("" = table
    * root); empty when the prefix has none. Directories / deeper
    * prefixes are not included. */
  def list(dir: String): Seq[String]

  /** Delete if present; false when absent. */
  def delete(rel: String): Boolean

  /** Atomic rename; false when `from` is absent. Of several racers
    * renaming the same `from`, exactly one observes true — the
    * one-winner primitive behind lock stealing. */
  def renameIfExists(from: String, to: String): Boolean

  /** Last-modified epoch millis, or None if absent. */
  def mtimeMs(rel: String): Option[Long]

  /** Bump `rel`'s mtime to now (lock heartbeat). Throws if absent. */
  def touch(rel: String): Unit

  // -- string conveniences (manifests are JSON text) -----------------
  final def putString(rel: String, s: String): Unit =
    put(rel, s.getBytes(UTF_8))
  final def putStringIfAbsent(rel: String, s: String): Boolean =
    putIfAbsent(rel, s.getBytes(UTF_8))
  final def readString(rel: String): Option[String] =
    read(rel).map(new String(_, UTF_8))
}

object ManifestStore {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ManifestStore]()

  /** Register a store for a table root (tests, object-store
    * backends). Exact-root match; call [[unregister]] when done. */
  def register(root: String, store: ManifestStore): Unit =
    registry.put(root, store)

  def unregister(root: String): Unit = registry.remove(root)

  /** Resolve the store for `root`: a registered backend wins;
    * otherwise local/`file://` roots get [[LocalManifestStore]] and
    * any other scheme is refused LOUDLY, naming the port point —
    * silently falling back to java.nio on an `s3a://` root would turn
    * the conditional put into check-then-act. */
  def forRoot(root: String): ManifestStore = {
    val reg = registry.get(root)
    if (reg != null) return reg
    val scheme = "^([a-zA-Z][a-zA-Z0-9+.-]*)://".r
      .findFirstMatchIn(root).map(_.group(1))
    scheme.filter(_ != "file").foreach { s =>
      throw new UnsupportedOperationException(
        s"TileTable mutation requires a ManifestStore for root " +
          s"'$s://' ($root) and none is registered. Port point: " +
          "implement ManifestStore.putIfAbsent with the store's " +
          "conditional put (S3 PutObject with If-None-Match:*, GCS " +
          "x-goog-if-generation-match:0) and register it via " +
          "ManifestStore.register(root, store); the rest of the " +
          "commit/lock/vacuum protocol is store-agnostic (proven " +
          "against InMemoryCasStore in TileTableCommitSpec).")
    }
    new LocalManifestStore(root)
  }
}

/** POSIX-filesystem store: the conditional put stages to a temp name
  * and `Files.createLink`s into place — atomic and failing with
  * EEXIST when the target exists, so of two racing committers exactly
  * one wins and the content appears atomically with the name (no
  * empty-file window). */
final class LocalManifestStore(root: String) extends ManifestStore {
  private def p(rel: String) = Paths.get(root, rel)

  override def putIfAbsent(rel: String, bytes: Array[Byte]): Boolean = {
    val target = p(rel)
    Files.createDirectories(target.getParent)
    val tmp = target.getParent.resolve(
      s".put.tmp.${java.util.UUID.randomUUID()}")
    Files.write(tmp, bytes)
    try { Files.createLink(target, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  override def put(rel: String, bytes: Array[Byte]): Unit = {
    val target = p(rel)
    Files.createDirectories(target.getParent)
    Files.write(target, bytes)
  }

  override def read(rel: String): Option[Array[Byte]] =
    try Some(Files.readAllBytes(p(rel)))
    catch {
      case _: java.nio.file.NoSuchFileException => None
      case _: java.io.FileNotFoundException => None
    }

  override def list(dir: String): Seq[String] = {
    val d = if (dir.isEmpty) Paths.get(root) else p(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    val s = Files.list(d)
    try s.iterator().asScala.filter(Files.isRegularFile(_))
      .map(_.getFileName.toString).toSeq
    finally s.close()
  }

  override def delete(rel: String): Boolean =
    try Files.deleteIfExists(p(rel))
    catch { case _: java.io.IOException => false }

  override def renameIfExists(from: String, to: String): Boolean =
    try {
      Files.move(p(from), p(to), StandardCopyOption.ATOMIC_MOVE)
      true
    } catch { case _: java.io.IOException => false }

  override def mtimeMs(rel: String): Option[Long] =
    try Some(Files.getLastModifiedTime(p(rel)).toMillis)
    catch { case _: java.io.IOException => None }

  override def touch(rel: String): Unit =
    Files.setLastModifiedTime(p(rel),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis()))
}

/** In-memory compare-and-swap object store — the test double standing
  * in for an S3/GCS backend: one flat key→(bytes, mtime) map, every
  * operation atomic under the map's monitor, conditional put = CAS on
  * key absence. `beforePutIfAbsent` runs OUTSIDE the monitor just
  * before the CAS, letting a test inject a competing commit into the
  * exact race window a distributed store exposes. */
final class InMemoryCasStore extends ManifestStore {
  private final case class Entry(bytes: Array[Byte], mtime: Long)
  private val objects = new java.util.HashMap[String, Entry]()

  /** Race-injection hook: invoked with the target name before the
    * conditional put's atomic section. */
  @volatile var beforePutIfAbsent: String => Unit = _ => ()

  override def putIfAbsent(rel: String, bytes: Array[Byte]): Boolean = {
    beforePutIfAbsent(rel)
    objects.synchronized {
      if (objects.containsKey(rel)) false
      else {
        objects.put(rel, Entry(bytes.clone(), System.currentTimeMillis()))
        true
      }
    }
  }

  override def put(rel: String, bytes: Array[Byte]): Unit =
    objects.synchronized {
      objects.put(rel, Entry(bytes.clone(), System.currentTimeMillis()))
      ()
    }

  override def read(rel: String): Option[Array[Byte]] =
    objects.synchronized {
      Option(objects.get(rel)).map(_.bytes.clone())
    }

  override def list(dir: String): Seq[String] = objects.synchronized {
    val prefix = if (dir.isEmpty) "" else s"$dir/"
    objects.keySet().asScala.iterator
      .filter(k => k.startsWith(prefix) &&
        !k.substring(prefix.length).contains('/'))
      .map(_.substring(prefix.length))
      .toSeq
  }

  override def delete(rel: String): Boolean =
    objects.synchronized { objects.remove(rel) != null }

  override def renameIfExists(from: String, to: String): Boolean =
    objects.synchronized {
      val e = objects.remove(from)
      if (e == null) false else { objects.put(to, e); true }
    }

  override def mtimeMs(rel: String): Option[Long] =
    objects.synchronized { Option(objects.get(rel)).map(_.mtime) }

  override def touch(rel: String): Unit = objects.synchronized {
    val e = objects.get(rel)
    if (e == null) throw new java.nio.file.NoSuchFileException(rel)
    objects.put(rel, e.copy(mtime = System.currentTimeMillis()))
    ()
  }

  /** Test hook: age an object's mtime backwards (stale-lock /
    * vacuum-grace scenarios without sleeps). */
  def setMtime(rel: String, t: Long): Unit = objects.synchronized {
    val e = objects.get(rel)
    if (e != null) { objects.put(rel, e.copy(mtime = t)); () }
  }

  def keys: Seq[String] =
    objects.synchronized { objects.keySet().asScala.toSeq }
}

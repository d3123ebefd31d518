package graft.state

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Watermark state KV ≙ the reference's state managers
  * (state/managers.py:77-115; backends state/backends.py:69-249): a
  * single JSON document read-modify-written as a whole. The Hadoop FS API
  * covers both local files and object stores (file:// and s3a:// behave
  * identically), replacing the reference's separate local/S3 backends.
  */
trait StateStore {
  def get(key: String): Option[String]
  def set(key: String, value: String): Unit
  def delete(key: String): Unit
}

/** Flat string-map JSON file via Hadoop FS, written atomically: flush
  * goes to a sibling temp path and renames over the target, so a crash
  * mid-write can never leave a truncated document behind (the reference's
  * whole-document flush, state/backends.py:101-141, has the same
  * read-modify-write semantics but overwrites in place). A state file
  * that exists but does not parse as a flat string map raises instead of
  * silently returning empty — an empty map here would quietly drop the
  * watermark and trigger a full-corpus rescan.
  */
final class FileStateStore(uri: String, conf: Configuration = new Configuration()) extends StateStore {
  private val path = new Path(uri)
  private val tmpPath = new Path(path.getParent, "." + path.getName + ".tmp")
  private val asidePath = new Path(path.getParent, "." + path.getName + ".old")
  private def fs: FileSystem = path.getFileSystem(conf)

  private def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case '"' => sb += '"'; i += 2
            case '\\' => sb += '\\'; i += 2
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'u' => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
            case c => sb += c; i += 2
          }
        case c => sb += c; i += 1
      }
    }
    sb.toString
  }

  private val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r

  private def load(): Map[String, String] = {
    // crash recovery for the non-overwriting-rename fallback in flush():
    // if the main document is missing but the aside copy exists, the
    // previous flush died between its two renames — the aside IS the
    // last committed state, so restore it instead of silently starting
    // fresh (which would drop the watermark)
    if (!fs.exists(path) && fs.exists(asidePath) && !fs.rename(asidePath, path))
      throw new IllegalStateException(
        s"state recovery failed: could not restore $asidePath -> $path; " +
          "refusing to return an empty watermark state while a committed copy exists")
    if (!fs.exists(path)) return Map.empty
    val in = fs.open(path)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // Anything left after removing the recognized pairs must be object
    // punctuation — otherwise the file is corrupt and we refuse to guess.
    val leftover = pair.replaceAllIn(text, "").replaceAll("[\\s{},]+", "")
    if (leftover.nonEmpty || text.trim.isEmpty)
      throw new IllegalStateException(
        s"state file $path is not a flat string-map JSON document; " +
          "refusing to return an empty watermark state from corrupt content")
    pair.findAllMatchIn(text).map(m => unescape(m.group(1)) -> unescape(m.group(2))).toMap
  }

  private def flush(m: Map[String, String]): Unit = {
    val json = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${escape(k)}": "${escape(v)}"""" }
      .mkString("{", ", ", "}")
    val out = fs.create(tmpPath, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    // rename is atomic on POSIX local FS (overwrites in place) and
    // consistent under the Hadoop FS contract on object stores — readers
    // see the old or the new document, never a prefix of the new one.
    // Some FS impls refuse to rename over an existing target; for those,
    // move the old document ASIDE first (not delete — a crash between the
    // two renames must not lose the committed watermark; load() restores
    // the aside copy when the main file is missing), then rename the new
    // one in and drop the aside copy.
    val renamed =
      try fs.rename(tmpPath, path)
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
    if (!renamed) {
      if (fs.exists(asidePath)) fs.delete(asidePath, false)
      if (fs.exists(path) && !fs.rename(path, asidePath))
        throw new IllegalStateException(s"atomic state flush failed: rename $path -> $asidePath")
      if (!fs.rename(tmpPath, path))
        throw new IllegalStateException(s"atomic state flush failed: rename $tmpPath -> $path")
      fs.delete(asidePath, false)
    }
  }

  def get(key: String): Option[String] = load().get(key)
  def set(key: String, value: String): Unit = flush(load() + (key -> value))
  def delete(key: String): Unit = flush(load() - key)
}

/** In-memory store for tests / dry runs. */
final class MemoryStateStore extends StateStore {
  private var m = Map.empty[String, String]
  def get(key: String): Option[String] = m.get(key)
  def set(key: String, value: String): Unit = m += key -> value
  def delete(key: String): Unit = m -= key
}

/** Backend factory ≙ the reference's `state/factory.py:18-50` (backend
  * chosen by config): `redis://host[:port][/namespace]` →
  * [[RedisStateStore]]; any file path or Hadoop FS URI (`file://`,
  * `s3a://`, bare path) → [[FileStateStore]].
  */
object StateStore {
  private val RedisUri = "^redis://([^:/]+)(?::(\\d+))?(?:/([^/]+))?/?$".r

  def fromUri(uri: String): StateStore = uri match {
    case RedisUri(host, port, namespace) =>
      new RedisStateStore(host,
        Option(port).map(_.toInt).getOrElse(6379),
        Option(namespace).getOrElse("graft_default"))
    case _ => new FileStateStore(uri)
  }
}

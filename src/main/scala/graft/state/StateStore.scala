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

/** Flat string-map JSON file via Hadoop FS (atomic-enough single-writer
  * semantics, same as the reference's whole-document flush,
  * state/backends.py:101-141).
  */
final class FileStateStore(uri: String, conf: Configuration = new Configuration()) extends StateStore {
  private val path = new Path(uri)
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
    if (!fs.exists(path)) return Map.empty
    val in = fs.open(path)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    pair.findAllMatchIn(text).map(m => unescape(m.group(1)) -> unescape(m.group(2))).toMap
  }

  private def flush(m: Map[String, String]): Unit = {
    val json = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${escape(k)}": "${escape(v)}"""" }
      .mkString("{", ", ", "}")
    val out = fs.create(path, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
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

package graft.schema

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** `.env` file loading ≙ the reference's `load_dotenv(args.env_file)`
  * (main.py:16-33): `KEY=VALUE` lines feeding the same `EXPORTER_*`
  * binding [[EngineConfig.fromEnv]] reads. Dotenv dialect, matching
  * python-dotenv's defaults:
  *   - blank lines and `#` comment lines skipped;
  *   - an optional `export ` prefix is stripped;
  *   - values may be single- or double-quoted (quotes stripped; inside
  *     double quotes `\n`/`\t` escape sequences expand);
  *   - the PROCESS environment wins over the file (`override=False`),
  *     so a deployment can still override any file-pinned value.
  */
object EnvFile {

  /** Parse `path` into its variable map (file contents only). */
  def load(path: String): Map[String, String] =
    Files.readAllLines(Paths.get(path)).asScala.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { line =>
        val l = if (line.startsWith("export ")) line.stripPrefix("export ").trim else line
        l.indexOf('=') match {
          case i if i > 0 => Some(l.take(i).trim -> unquote(l.drop(i + 1).trim))
          case _ => None // malformed line: skipped, like python-dotenv
        }
      }
      .toMap

  /** The environment [[EngineConfig.fromEnv]] should see: file values
    * overlaid by the real process environment (process wins).
    */
  def overlay(path: String, env: Map[String, String] = sys.env): Map[String, String] =
    load(path) ++ env

  private def unquote(v: String): String =
    if (v.length >= 2 && v.head == '"' && v.last == '"')
      v.substring(1, v.length - 1).replace("\\n", "\n").replace("\\t", "\t")
    else if (v.length >= 2 && v.head == '\'' && v.last == '\'')
      v.substring(1, v.length - 1)
    else v
}

package graft.schema

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** `--env-file` loading ≙ `load_dotenv(args.env_file)` (main.py:16-33):
  * dotenv dialect parsing, and the process environment winning over
  * file values (`override=False`).
  */
class EnvFileSpec extends AnyFunSuite {

  private def tempEnv(content: String): String = {
    val f = Files.createTempFile("graft-env", ".env")
    Files.writeString(f, content)
    f.toFile.deleteOnExit()
    f.toString
  }

  test("parses KEY=VALUE, comments, export prefix, and quoted values") {
    val p = tempEnv(
      """# exporter deployment pins
        |EXPORTER_TRACKER__SEARCH__RANGE=4w
        |export EXPORTER_STATEFUL=true
        |EXPORTER_TRACKER__SEARCH__QUERY="Queue: TEST and Updated >= now() - 2h"
        |SINGLE='keep $literal'
        |
        |malformed line without equals
        |EMPTY=
        |""".stripMargin)
    val vars = EnvFile.load(p)
    assert(vars("EXPORTER_TRACKER__SEARCH__RANGE") == "4w")
    assert(vars("EXPORTER_STATEFUL") == "true")
    assert(vars("EXPORTER_TRACKER__SEARCH__QUERY") == "Queue: TEST and Updated >= now() - 2h")
    assert(vars("SINGLE") == "keep $literal")
    assert(vars("EMPTY") == "")
    assert(!vars.contains("malformed line without equals"))
  }

  test("overlay: the process environment wins over file values (override=False)") {
    val p = tempEnv("A=from_file\nB=only_file\n")
    val merged = EnvFile.overlay(p, env = Map("A" -> "from_env", "C" -> "only_env"))
    assert(merged("A") == "from_env")
    assert(merged("B") == "only_file")
    assert(merged("C") == "only_env")
  }

  test("EngineConfig binds from an overlaid env file") {
    val p = tempEnv("EXPORTER_TRACKER__SEARCH__RANGE=6w\nEXPORTER_STATEFUL=true\n")
    val cfg = EngineConfig.fromEnv(EnvFile.overlay(p, env = Map.empty))
    assert(cfg.search.range.contains("6w"))
    assert(cfg.stateful)
  }
}

package graft.helium

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import Model.EtlMode

class SettingsSpec extends AnyFunSuite {

  private def write(content: String): String = {
    val f = Files.createTempFile("settings", ".toml")
    Files.writeString(f, content)
    f.toString
  }

  private val valid =
    """node_addr = "http://127.0.0.1:4467"
      |database_url = "/tmp/helium_lite"
      |# comment line
      |mode = "rewards"
      |backfill = "true"
      |
      |[log]
      |log_dir = "log"
      |""".stripMargin

  test("parses the reference-shaped settings file") {
    val s = Settings.parse(write(valid))
    assert(s == Settings.HeliumSettings(
      "http://127.0.0.1:4467", "/tmp/helium_lite",
      EtlMode.Rewards, backfill = true, logDir = "log"))
  }

  test("mode is matched lowercase; unknown mode errors (settings.rs:71-85)") {
    val s = Settings.parse(write(valid.replace("\"rewards\"", "\"FULL\"")))
    assert(s.mode == EtlMode.Full)
    intercept[IllegalArgumentException] {
      Settings.parse(write(valid.replace("\"rewards\"", "\"bogus\"")))
    }
  }

  test("backfill is a strict string bool (settings.rs:87-103)") {
    intercept[IllegalArgumentException] {
      Settings.parse(write(valid.replace("\"true\"", "\"yes\"")))
    }
  }

  test("missing required key errors") {
    intercept[IllegalArgumentException] {
      Settings.parse(write(valid.linesIterator
        .filterNot(_.startsWith("node_addr")).mkString("\n")))
    }
  }
}

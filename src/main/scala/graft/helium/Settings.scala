package graft.helium

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import Model.EtlMode

/** S7 — config source parity (src/settings.rs:33-103,
  * config/settings.toml). A minimal TOML-subset reader (flat `key = value`
  * pairs plus one-level `[section]`s — all the reference's file uses), with
  * the same strict deserializers: mode and backfill are *strings* in the
  * file and are matched lowercase, anything else errors
  * (src/settings.rs:71-103).
  */
object Settings {

  case class HeliumSettings(
      nodeAddr: String,
      /** In the reference a Postgres URL; here the table-root directory the
        * sink writes under. */
      dataRoot: String,
      mode: EtlMode,
      backfill: Boolean,
      logDir: String)

  def parse(path: String): HeliumSettings = {
    val kv = parseTomlSubset(path)
    def req(k: String): String = kv.getOrElse(k,
      throw new IllegalArgumentException(s"missing config key: $k"))
    val backfill = req("backfill").toLowerCase match {
      case "true" => true
      case "false" => false
      case u => throw new IllegalArgumentException(
        s"""unsupported backfill: "$u"""")
    }
    HeliumSettings(
      nodeAddr = req("node_addr"),
      dataRoot = req("database_url"),
      mode = EtlMode.parse(req("mode")),
      backfill = backfill,
      logDir = kv.getOrElse("log.log_dir", "log"))
  }

  /** Flat TOML subset: comments (#), `[section]` prefixes, quoted or bare
    * scalar values. */
  private[helium] def parseTomlSubset(path: String): Map[String, String] = {
    var section = ""
    Files.readAllLines(Paths.get(path)).asScala
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap {
        case l if l.startsWith("[") && l.endsWith("]") =>
          section = l.substring(1, l.length - 1).trim + "."
          None
        case l if l.contains("=") =>
          val Array(k, v) = l.split("=", 2)
          val raw = v.trim.takeWhile(_ != '#').trim
          val unq =
            if (raw.startsWith("\"") && raw.endsWith("\"") && raw.length >= 2)
              raw.substring(1, raw.length - 1)
            else raw
          Some(section + k.trim -> unq)
        case other =>
          throw new IllegalArgumentException(s"unparseable config line: $other")
      }.toMap
  }
}

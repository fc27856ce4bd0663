package graft.app

import scala.io.Source

/** INI config files with `$ENV_VAR` expansion — the reference's config
  * system (kafka_wrapper/config_file_parser.py:23-193): sections like
  * `[broker]/[producer]/[consumer]/[heartbeat]/[log]`, values may reference
  * environment variables with `$NAME`. Broker/producer/consumer sections
  * pass through to the Kafka source/sink as `kafka.<key>` options.
  */
final case class IniConfig(sections: Map[String, Map[String, String]]) {
  def section(name: String): Map[String, String] =
    sections.getOrElse(name, Map.empty)

  /** Kafka option passthrough: broker + the given role section, prefixed
    * `kafka.` for the Spark Kafka source/sink. */
  def kafkaOptions(role: String): Map[String, String] =
    (section("broker") ++ section(role)).map { case (k, v) => s"kafka.$k" -> v }
}

object IniConfig {
  private val sectionRe = """\[([^\]]+)\]""".r
  private val envRe = """\$([A-Za-z_][A-Za-z0-9_]*)""".r

  def expandEnv(v: String, env: Map[String, String] = sys.env): String =
    envRe.replaceAllIn(v, m =>
      scala.util.matching.Regex.quoteReplacement(env.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"environment variable ${m.group(1)} not set"))))

  def parse(lines: Iterator[String], env: Map[String, String] = sys.env): IniConfig = {
    var current = ""
    val out = scala.collection.mutable.Map.empty[String, Map[String, String]]
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith(";"))
      .foreach {
        case sectionRe(name) =>
          current = name
          out.getOrElseUpdate(current, Map.empty)
        case kv if kv.contains('=') =>
          val Array(k, v) = kv.split("=", 2)
          out(current) = out.getOrElse(current, Map.empty) +
            (k.trim -> expandEnv(v.trim, env))
        case other =>
          throw new IllegalArgumentException(s"unparseable config line: $other")
      }
    IniConfig(out.toMap)
  }

  def load(path: String, env: Map[String, String] = sys.env): IniConfig = {
    val src = Source.fromFile(path)
    try parse(src.getLines(), env) finally src.close()
  }
}
